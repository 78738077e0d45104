package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Global (and per-group) order statistics — row_number, running sum —
  * WITHOUT the single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` on a raw corpus plans as one
  * `WindowExec` holding every row — "Moving all data to a single
  * partition", the canonical scale killer (round-9 verdict on
  * q197/q198/q209). The same is true of `PARTITION BY grp ORDER BY …`
  * whenever one group dominates (one language is most of a 100 TB
  * corpus). The fix is the two-level decomposition
  * [[graft.llm.SequencePacker]] uses for its prefix sum, generalized
  * to any sortable key and optional group columns:
  *
  *   1. range-partition by (group cols ++ order cols) — Spark's
  *      `RangePartitioner` gives monotone partition ids, so
  *      `spark_partition_id()` IS a coarse rank bucket, and a huge
  *      group simply spans several buckets;
  *   2. per-(group, bucket) counts/sums aggregate map-side into a
  *      relation of at most |groups| × numShufflePartitions rows; the
  *      running offset over THAT tiny tier is the only
  *      zero/low-parallelism window (recurse the same trick if a
  *      million-partition cluster ever makes it big);
  *   3. offsets broadcast back and a window partitioned by
  *      (group, bucket) finishes locally — no window partition ever
  *      holds more than one range slice.
  *
  * The result is bit-identical to the monolithic window: ranks depend
  * only on the TOTAL order, not on where the sampled range boundaries
  * fall. The ranged frame is persisted for the duration of the query
  * (via [[CacheScope]]) so the offsets branch and the main branch see
  * one consistent partitioning.
  *
  * Callers must pass a total order within each group (tie-break on a
  * unique id): with duplicate keys, `row_number` and a row-frame
  * running sum are layout-dependent in ANY engine — determinism
  * starts with the order being total. Aggregate ties away first
  * (q198 does) or add a key.
  */
object DistributedOrder {

  /** Adds `out` = 1-based row_number over `orderCols`, restarting per
    * `partitionBy` group (global when `partitionBy` is empty).
    */
  def withRowNumber(
      df: DataFrame, orderCols: Seq[Column], out: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    withOffsets(df, orderCols, partitionBy, count(lit(1)).cast("long")) {
      (joined, wIn) =>
        joined.withColumn(out,
          coalesce(col("__off"), lit(0L)) + row_number().over(wIn))
    }

  /** Adds `out` = exclusive running sum of `value` over `orderCols`
    * (sum of all STRICTLY PRECEDING rows in the group; first row gets
    * 0), restarting per `partitionBy` group.
    */
  def withRunningSum(
      df: DataFrame, orderCols: Seq[Column], value: Column, out: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    withOffsets(df, orderCols, partitionBy, sum(value).cast("long")) {
      (joined, wIn) =>
        joined.withColumn(
          out,
          coalesce(col("__off"), lit(0L)) + coalesce(
            sum(value).over(wIn.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
    }

  /** Adds `out` = INCLUSIVE running maximum of `value` over
    * `orderCols` (max of the row's group prefix including itself),
    * restarting per `partitionBy` group. Same two-level shape: the
    * offset tier carries each bucket's max and combines with a
    * running max instead of a running sum.
    */
  def withRunningMax(
      df: DataFrame, orderCols: Seq[Column], value: Column, out: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    withOffsets(df, orderCols, partitionBy, max(value).cast("long"),
      offAgg = max(col("__tot"))) { (joined, wIn) =>
      // greatest() skips NULL (the first bucket has no offset), so the
      // prefix max degenerates correctly to the in-bucket running max
      joined.withColumn(
        out,
        greatest(
          col("__off"),
          max(value).over(wIn.rowsBetween(Window.unboundedPreceding, 0))))
    }

  private def withOffsets(
      df: DataFrame, orderCols: Seq[Column], partitionBy: Seq[String],
      partAgg: Column,
      offAgg: Column = sum(col("__tot")))(
      finish: (DataFrame, org.apache.spark.sql.expressions.WindowSpec)
        => DataFrame): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val rangeKeys = partitionBy.map(col) ++ orderCols
    val ranged = CacheScope.persist(
      df.repartitionByRange(parts, rangeKeys: _*)
        .withColumn("__pid", spark_partition_id()))
    val grpKeys = partitionBy :+ "__pid"
    val perPart = ranged.groupBy(grpKeys.map(col): _*).agg(partAgg.as("__tot"))
    // __off stays NULL for a group's first bucket: sum-based callers
    // coalesce it to 0, the max-based caller lets greatest() skip it
    // (a sentinel zero would corrupt a running max of negatives)
    val wOff = Window.partitionBy(partitionBy.map(col): _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perPart
      .withColumn("__off", offAgg.over(wOff))
      .select((grpKeys :+ "__off").map(col): _*)
    val wIn = Window.partitionBy(grpKeys.map(col): _*).orderBy(orderCols: _*)
    finish(ranged.join(broadcast(offsets), grpKeys), wIn)
      .drop("__pid", "__off")
  }
}
