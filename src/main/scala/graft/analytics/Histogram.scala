package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histograms over an integer measure — the profiling
  * primitive behind length/size distribution reports (the reference's
  * dashboard renders distribution tables from full result sets; at
  * corpus scale the histogram IS the distribution).
  *
  * Scale shape: one map-side bucket projection + one hash aggregate on
  * the bucket id. The shuffle carries one row per non-empty bucket per
  * map partition — bounded by value-range/width, independent of row
  * count. Bucket arithmetic is integral (`div`), so results are exact
  * and engine-portable (no float binning drift at bucket edges).
  */
object Histogram {

  /** One row per non-empty bucket: bucket id, inclusive lo / exclusive
    * hi bound, row count, and the observed min/max inside the bucket.
    * Bucketing is FLOOR division (negative values land in negative
    * buckets with lo ≤ v < hi still holding) — `v div w` would
    * truncate toward zero and put negatives in the wrong bucket;
    * `(v − pmod(v, w)) / w` is pure integer floor math.
    */
  def equiWidth(df: DataFrame, value: Column, width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive: $width")
    df.select(value.cast("long").as("__v"))
      .select(
        ((col("__v") - pmod(col("__v"), lit(width))) / width)
          .cast("long").as("bucket"),
        col("__v"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("cnt"),
        min("__v").as("v_min"),
        max("__v").as("v_max"))
      .select(
        col("bucket"),
        (col("bucket") * width).as("lo"),
        (col("bucket") * width + width).as("hi"),
        col("cnt"), col("v_min"), col("v_max"))
  }
}
