package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{
  MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState,
  TTLConfig, TimeMode, TimerValues}

/** Streaming per-key grouped counters on `transformWithState` using
  * MAP-typed state — the third rung of the typed-state surface
  * (ValueState: q162, timers: q163, ListState: q166). State per user
  * is one map entry per DISTINCT event type (bounded by the type
  * vocabulary, not the stream length); with RocksDB each map entry is
  * its own store key, so updating one counter never rewrites the
  * others — the property that makes map state the right shape for
  * wide per-key counter families where a ValueState[case class] would
  * read-modify-write the whole struct per event.
  *
  * Per-key sentinel rows (`event_id < 0`) flush: emit one row per
  * (user, type) and clear.
  */
object StreamingCounters {

  case class In(user_id: Long, event_type: String, event_id: Long)
  case class CountRow(user_id: Long, event_type: String, n: Long)

  implicit val inEncoder: Encoder[In] = Encoders.product[In]
  implicit val countEncoder: Encoder[CountRow] = Encoders.product[CountRow]

  /** Shared fold: bump one map entry per event; sentinel rows flush
    * the family as ranked rows and clear.
    */
  private def foldCounts(
      counts: MapState[String, Long], user: Long,
      rows: Iterator[In]): Iterator[CountRow] = {
    val (sentinels, events) = rows.toSeq.partition(_.event_id < 0)
    events.foreach { e =>
      val cur = if (counts.containsKey(e.event_type))
        counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, cur + 1L)
    }
    if (sentinels.isEmpty) Iterator.empty
    else {
      val out = counts.iterator().map {
        case (t, n) => CountRow(user, t, n)
      }.toSeq.sortBy(_.event_type)
      counts.clear()
      out.iterator
    }
  }

  class CounterProcessor extends StatefulProcessor[Long, In, CountRow] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[In],
        timers: TimerValues): Iterator[CountRow] =
      foldCounts(counts, user, rows)
  }

  def countsByType(events: Dataset[In]): Dataset[CountRow] = {
    implicit val keyEncoder: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new CounterProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** WARM-STARTED counters — `StatefulProcessorWithInitialState`, the
    * bootstrap constructor of the transformWithState family: state is
    * seeded from a BATCH relation (a backfill snapshot) before the
    * first microbatch, then the stream increments it. The production
    * migration pattern: recompute history once as a batch aggregate,
    * then run the stream from the cutover offset — no replay of the
    * historical stream through the stateful operator.
    *
    * `handleInitialState` is invoked per initial-state row (a key may
    * carry several — one per event type here) and ADDS into the map,
    * so seeding composes with itself and with early stream rows
    * regardless of invocation order within the first batch.
    */
  class WarmStartCounterProcessor
      extends StatefulProcessorWithInitialState[Long, In, CountRow, CountRow] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(
        user: Long, init: CountRow, timers: TimerValues): Unit = {
      val cur = if (counts.containsKey(init.event_type))
        counts.getValue(init.event_type) else 0L
      counts.updateValue(init.event_type, cur + init.n)
    }

    override def handleInputRows(
        user: Long, rows: Iterator[In],
        timers: TimerValues): Iterator[CountRow] =
      foldCounts(counts, user, rows)
  }

  def countsByTypeWarmStart(
      events: Dataset[In], initial: Dataset[CountRow]): Dataset[CountRow] = {
    implicit val keyEncoder: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(
        new WarmStartCounterProcessor, TimeMode.None(), OutputMode.Append(),
        initial.groupByKey(_.user_id))
  }
}
