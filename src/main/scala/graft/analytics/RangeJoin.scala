package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join with NO equi key: match every
  * point to every interval containing it.
  *
  * Spark's native plan for `a.ts BETWEEN b.lo AND b.hi` with no
  * equality conjunct is a broadcast-nested-loop or cartesian product —
  * O(points × intervals), dead at scale. The scale-correct plan bins
  * the axis: each interval replicates to the fixed-width bins it
  * overlaps (explode of a tiny `sequence`), each point computes its
  * single bin, and the match becomes a BIN EQUI-JOIN plus the exact
  * containment filter. Work is O(points + intervals × avg_span/width +
  * true_matches); each point carries exactly one bin, so no dedup pass
  * is needed.
  *
  * `binWidth` tunes replication: ~the typical interval length gives
  * ≤2 bins per interval. Skewed bins (a hot time window) respond to
  * the same AQE/salting treatment as any skewed equi-join.
  */
object RangeJoin {

  /** @param points    rows with a numeric axis value `ptCol`
    * @param intervals rows with [loCol, hiCol] bounds (inclusive)
    * @return points ⋈ intervals on containment; all columns of both
    *         sides (interval bound columns included)
    */
  def binnedIntervalJoin(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame =
    binnedIntervalJoinKeyed(points, ptCol, intervals, loCol, hiCol,
      binWidth, keys = Nil)

  /** The keyed form: containment AND equality on `keys` (columns
    * present on both sides — e.g. per-user attribution windows). The
    * shuffle key becomes (keys…, bin), so a hot entity spreads across
    * its time bins instead of concentrating in one reducer — strictly
    * better skew behavior than keys-only equi-joins get.
    */
  def binnedIntervalJoinKeyed(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      keys: Seq[String]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val pts = points.withColumn("__bin", floor(col(ptCol) / binWidth).cast("long"))
    pts.join(binned, "__bin" +: keys)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
