package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming per-key top-k digest on `transformWithState` using
  * LIST-typed state — the `ListState` rung of the typed-state surface
  * ([[StreamingSessionsTws]] covers `ValueState` and event-time
  * timers). State per key is AT MOST k entries, pruned on every fold:
  * the property that lets a top-k-per-user digest run forever on an
  * unbounded stream where `collect_list`-style accumulation cannot.
  *
  * Emission contract (mirrors q56's sentinel discipline): per-key
  * sentinel rows (`event_id < 0`) flush the digest — the processor
  * emits the key's current top-k ranked rows and clears state. Each
  * fold reads at most k stored entries, merges the batch, and writes
  * back at most k (`ListState.put` replaces the list in one write).
  */
object StreamingTopK {

  case class In(user_id: Long, v_e2: Long, event_id: Long)
  case class Entry(v_e2: Long, event_id: Long)
  case class RankedRow(user_id: Long, rank: Long, v_e2: Long, event_id: Long)

  implicit val inEncoder: Encoder[In] = Encoders.product[In]
  implicit val rankedEncoder: Encoder[RankedRow] = Encoders.product[RankedRow]

  /** Greater = better: by value desc, then event_id asc for a total
    * deterministic order.
    */
  private def beats(a: Entry, b: Entry): Boolean =
    a.v_e2 > b.v_e2 || (a.v_e2 == b.v_e2 && a.event_id < b.event_id)

  class TopKProcessor(k: Int)
      extends StatefulProcessor[Long, In, RankedRow] {

    @transient private var top: ListState[Entry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[Entry](
        "top", Encoders.product[Entry], TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[In],
        timers: TimerValues): Iterator[RankedRow] = {
      val (sentinels, events) = rows.toSeq.partition(_.event_id < 0)
      if (events.nonEmpty) {
        val cur = top.get().toSeq
        val merged = (cur ++ events.map(e => Entry(e.v_e2, e.event_id)))
          .sortWith(beats).take(k)
        top.put(merged.toArray)
      }
      if (sentinels.isEmpty) Iterator.empty
      else {
        val ranked = top.get().toSeq.sortWith(beats).zipWithIndex.map {
          case (e, i) => RankedRow(user, i + 1L, e.v_e2, e.event_id)
        }
        top.clear()
        ranked.iterator
      }
    }
  }

  def topK(events: Dataset[In], k: Int): Dataset[RankedRow] = {
    implicit val keyEncoder: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new TopKProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
