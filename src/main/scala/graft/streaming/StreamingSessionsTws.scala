package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based sessionization on `transformWithState` — the engine's
  * CURRENT arbitrary-stateful API (Spark 4.x), which supersedes
  * `flatMapGroupsWithState` ([[StreamingSessions]] keeps the legacy
  * form; both are gated against the same oracle, q56 vs q162).
  *
  * What the new API buys at scale, and what this operator exercises:
  * typed per-key state handles (`ValueState`) declared in `init` and
  * stored NATIVELY in the state store — with the RocksDB provider the
  * one open-session struct per user lives off-heap and incrementally
  * checkpoints, instead of the legacy path's full per-batch JVM-object
  * snapshot. Fold logic and semantics are identical to
  * [[StreamingSessions]]: one bounded struct per user, strictly-
  * greater gap rule, closed sessions emitted, open session parked.
  *
  * `transformWithState` REQUIRES the RocksDB state store provider;
  * callers scope `spark.sql.streaming.stateStore.providerClass` at
  * stream start (see the q162 gate) the same way gates scope state
  * partitions.
  */
object StreamingSessionsTws {

  import StreamingSessions.{Ev, OpenSession, SessionRow}

  /** One `ValueState[OpenSession]` per user; batch events are folded
    * in (ts, event_id) order for determinism under the same batch-
    * monotonic arrival contract as the legacy operator.
    */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessionRow] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[SessionRow] = {
      val evs = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val closed = scala.collection.mutable.ListBuffer[SessionRow]()
      var cur: Option[OpenSession] = if (open.exists()) Some(open.get()) else None
      evs.foreach { e =>
        cur = cur match {
          case None => Some(OpenSession(e.ts_us, e.ts_us, 1L, 1L))
          case Some(o) if e.ts_us - o.last_us > gapUs =>
            closed += SessionRow(user, o.idx, o.n, o.start_us, o.last_us)
            Some(OpenSession(e.ts_us, e.ts_us, 1L, o.idx + 1))
          case Some(o) =>
            Some(o.copy(last_us = e.ts_us, n = o.n + 1))
        }
      }
      cur.foreach(open.update)
      closed.iterator
    }
  }

  def sessionize(
      events: Dataset[Ev], gapSeconds: Long = 1800L): Dataset[SessionRow] = {
    implicit val rowEncoder: Encoder[SessionRow] = StreamingSessions.rowEncoder
    implicit val keyEncoder: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapSeconds * 1000000L),
        TimeMode.None(), OutputMode.Append())
  }
}
