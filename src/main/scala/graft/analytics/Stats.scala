package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-free exact statistics over pre-quantized integer columns.
  *
  * `corr()`/`covar_samp()` in any engine accumulate doubles in
  * partition order — fine for analysis, useless for cross-engine
  * verification. Computing the five integer power sums exactly
  * (commutative BIGINT addition) and then evaluating ONE pinned double
  * expression makes Pearson correlation bit-reproducible: IEEE
  * multiply/divide/sqrt are exactly rounded, so identical association
  * yields identical bits. Callers must keep the quantized inputs small
  * enough that n·Σx² fits a signed 64-bit integer.
  */
object Stats {

  /** Per-group Pearson correlation of (x, y) in floored parts-per-
    * million, from exact integer sums. Emits the sums alongside so the
    * gate pins the intermediate state, not just the ratio.
    */
  def corrE6(df: DataFrame, grp: Column, x: Column, y: Column): DataFrame = {
    val sums = df.select(grp.as("g"), x.as("x"), y.as("y"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    sums.select(
      col("g"), col("n"), col("sx"), col("sy"),
      when(dx > 0 && dy > 0,
        floor(num.cast("double")
          / (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))
          * lit(1000000.0)).cast("long"))
        .as("corr_e6"))
  }
}
