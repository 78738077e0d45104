package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the streaming counterpart of
  * `analytics.EventSessions`, built on `KeyValueGroupedDataset.
  * flatMapGroupsWithState` (the engine's arbitrary-stateful surface;
  * windows/dropDuplicates can't express "emit when the gap closes me").
  *
  * State per user is ONE open-session struct (start, last-seen, count,
  * index) — bounded regardless of stream length, the property that
  * makes this run forever on a cluster. Each invocation folds the
  * batch's events (sorted by (ts, event_id) for determinism) through
  * the same strictly-greater gap rule as the batch operator, emits
  * every session the batch closed, and parks the still-open session
  * back in the state store for the next microbatch.
  *
  * Ordering contract: events must arrive batch-monotonically per user
  * (a batch never contains events older than a previous batch's) — the
  * standard watermark discipline; upstream staging enforces it here.
  * A session only becomes visible once a later event (or a sentinel —
  * see q56) closes it; sentinel-opened sessions die silently in state.
  */
object StreamingSessions {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class OpenSession(start_us: Long, last_us: Long, n: Long, idx: Long)
  case class SessionRow(
      user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long)

  implicit val evEncoder: Encoder[Ev] = Encoders.product[Ev]
  implicit val stateEncoder: Encoder[OpenSession] = Encoders.product[OpenSession]
  implicit val rowEncoder: Encoder[SessionRow] = Encoders.product[SessionRow]
  private implicit val keyEncoder: Encoder[Long] = Encoders.scalaLong

  def sessionize(events: Dataset[Ev], gapSeconds: Long = 1800L): Dataset[SessionRow] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, it, state) =>
        val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val closed = scala.collection.mutable.ListBuffer[SessionRow]()
        var open = state.getOption
        evs.foreach { e =>
          open = open match {
            case None => Some(OpenSession(e.ts_us, e.ts_us, 1L, 1L))
            case Some(o) if e.ts_us - o.last_us > gapSeconds * 1000000L =>
              closed += SessionRow(user, o.idx, o.n, o.start_us, o.last_us)
              Some(OpenSession(e.ts_us, e.ts_us, 1L, o.idx + 1))
            case Some(o) =>
              Some(o.copy(last_us = e.ts_us, n = o.n + 1))
          }
        }
        open.foreach(state.update)
        closed.iterator
      }
}
