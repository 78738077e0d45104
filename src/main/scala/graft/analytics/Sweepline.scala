package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Interval-concurrency via the classic sweep line: how many intervals
  * are open at once, per group — the "peak concurrent sessions / peak
  * open connections" operator of capacity planning.
  *
  * The naive formulation (self-join on overlap, or a point-in-interval
  * range join) is quadratic in the hot spots it is supposed to measure.
  * The sweep line is linear: every interval contributes two deltas
  * (+1 at start, −1 at end), deltas are pre-aggregated per (group,
  * instant) — ONE map-side-combined shuffle whose cardinality is the
  * number of distinct transition instants, not the number of intervals
  * — and a per-group running sum walks the timeline once. Peak and
  * peak time fall out of one more tiny aggregate over the (already
  * shuffled) running relation.
  *
  * Convention: transitions at the same instant net out before the
  * running sum, so an interval ending exactly when another starts does
  * not inflate the peak. All arithmetic is integral — engine-portable.
  */
object Sweepline {

  /** Peak concurrency of fixed-duration intervals `[start, start+dur)`.
    *
    * @param start inclusive interval start (integral, e.g. epoch secs)
    * @param dur   interval length in the same unit
    * @return one row per group: `g`, `peak`, `peak_at` (earliest
    *         instant the peak is reached), `n_points` (distinct
    *         transition instants)
    */
  def maxConcurrency(
      df: DataFrame,
      grp: Column,
      start: Column,
      dur: Column): DataFrame = {
    val opens = df.select(grp.as("g"), start.cast("long").as("t"), lit(1L).as("d"))
    val closes = df.select(
      grp.as("g"), (start.cast("long") + dur.cast("long")).as("t"), lit(-1L).as("d"))
    val deltas = opens.unionAll(closes).groupBy("g", "t").agg(sum("d").as("d"))
    // One running sum per group; `t` is unique within a group after the
    // pre-aggregate, so the frame is deterministic.
    val w = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = CacheScope.persist(
      deltas.select(col("g"), col("t"), sum(col("d")).over(w).as("run")))
    val peak = run.groupBy("g")
      .agg(max("run").as("peak"), count(lit(1)).as("n_points"))
    run.join(broadcast(peak), "g")
      .filter(col("run") === col("peak"))
      .groupBy("g", "peak", "n_points")
      .agg(min("t").as("peak_at"))
      .select("g", "peak", "peak_at", "n_points")
  }
}
