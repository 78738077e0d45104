package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing — merge overlapping/touching [start, end]
  * intervals per key into maximal disjoint spans (availability windows,
  * session stitching, contiguous-coverage reports).
  *
  * Classic sweep: order a key's intervals by start, track the running
  * max of `end` over all PRECEDING intervals; an interval whose start
  * exceeds that max opens a new island (closed-interval semantics:
  * `start == prev_end` touches, so it merges). The island ordinal is
  * the running count of openers, and a group-by on (key, island)
  * collapses each island to its span.
  *
  * Scale shape: one shuffle on `key`; both window walks and the final
  * aggregation reuse that partitioning (Catalyst collapses them into
  * one sort). Nothing is ever driver-side and no key's data needs to
  * fit anywhere but its own sorted partition — the 100 TB failure mode
  * would be one giant key, which interval data (per-user/per-device
  * activity) doesn't produce.
  */
object Intervals {

  /** Returns one row per merged island: key, island start/end, and the
    * number of source intervals it absorbed. `tie` makes the sweep
    * order total when (start, end) collide, so the island numbering —
    * and therefore `n_merged` — is deterministic.
    */
  def merge(df: DataFrame, key: Column, start: Column, end: Column,
      tie: Column): DataFrame = {
    val base = df.select(key.as("k"), start.as("s"), end.as("e"), tie.as("t"))
    val ord = Window.partitionBy("k").orderBy("s", "e", "t")
    val prevMax = max(col("e"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L)
    base
      .withColumn("__island",
        sum(opens).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("k"), col("__island"))
      .agg(
        min(col("s")).as("start"),
        max(col("e")).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
