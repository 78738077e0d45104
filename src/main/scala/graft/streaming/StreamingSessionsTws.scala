package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

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

  /** Event shape for the event-time variant: `ts` (timestamp) carries
    * the watermark; `ts_us` keeps the exact microsecond arithmetic.
    */
  case class EvT(
      user_id: Long, ts: java.sql.Timestamp, ts_us: Long, event_id: Long)

  implicit val evtEncoder: Encoder[EvT] = Encoders.product[EvT]

  /** Event-time-TIMER sessionization: sessions close THEMSELVES when
    * the watermark passes `last + gap` — no per-user flush sentinels
    * (q56/q162's crutch), only a global watermark advance. This is the
    * production shape: a quiet user's session emits as soon as the
    * stream's time passes the gap, not when that user happens to send
    * another event.
    *
    * Mechanics: each fold re-registers one event-time timer at
    * `last + gap` (+1 ms, strictly after); an arriving batch that
    * itself closes a session (gap exceeded within the fold) deletes
    * the stale timer. When a timer fires, the watermark is ≥ the
    * session's close boundary, so the engine has already guaranteed no
    * admissible event can extend it: emit and clear. `nextIdx` state
    * preserves per-user session numbering across timer closes.
    */
  class TimerSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, EvT, SessionRow] {

    @transient private var open: ValueState[OpenSession] = _
    @transient private var nextIdx: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)
      nextIdx = getHandle.getValueState[Long](
        "nextIdx", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def timerFor(o: OpenSession): Long = (o.last_us + gapUs) / 1000 + 1

    override def handleInputRows(
        user: Long, rows: Iterator[EvT],
        timers: TimerValues): Iterator[SessionRow] = {
      val evs = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val closed = scala.collection.mutable.ListBuffer[SessionRow]()
      var cur: Option[OpenSession] = if (open.exists()) Some(open.get()) else None
      cur.foreach(o => getHandle.deleteTimer(timerFor(o)))
      evs.foreach { e =>
        cur = cur match {
          case None =>
            val idx = if (nextIdx.exists()) nextIdx.get() else 1L
            Some(OpenSession(e.ts_us, e.ts_us, 1L, idx))
          case Some(o) if e.ts_us - o.last_us > gapUs =>
            closed += SessionRow(user, o.idx, o.n, o.start_us, o.last_us)
            Some(OpenSession(e.ts_us, e.ts_us, 1L, o.idx + 1))
          case Some(o) =>
            Some(o.copy(last_us = e.ts_us, n = o.n + 1))
        }
      }
      cur.foreach { o =>
        open.update(o)
        nextIdx.update(o.idx + 1)
        getHandle.registerTimer(timerFor(o))
      }
      closed.iterator
    }

    override def handleExpiredTimer(
        user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionRow] = {
      if (!open.exists()) Iterator.empty
      else {
        val o = open.get()
        // only the CURRENT session's timer is live (stale ones are
        // deleted on every fold), but guard anyway
        if (expired.getExpiryTimeInMs != timerFor(o)) Iterator.empty
        else {
          open.clear()
          Iterator.single(SessionRow(user, o.idx, o.n, o.start_us, o.last_us))
        }
      }
    }
  }

  def sessionizeWithTimers(
      events: Dataset[EvT], gapSeconds: Long = 1800L): Dataset[SessionRow] = {
    implicit val rowEncoder: Encoder[SessionRow] = StreamingSessions.rowEncoder
    implicit val keyEncoder: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new TimerSessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
