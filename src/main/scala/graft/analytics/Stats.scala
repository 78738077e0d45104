package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Two-sample Kolmogorov–Smirnov drift statistic in floored ppm:
    * `max_v |F_a(v) − F_b(v)|` between the value distributions of two
    * populations — the standard "did this feed's distribution move?"
    * monitor for training-data pipelines.
    *
    * Shape: one count shuffle onto the distinct-VALUE grid (each grid
    * row carries both populations' counts), then cumulative sums walk
    * the grid once. The grid is quantization-bounded — its size is the
    * number of distinct quantized values, NOT the corpus size — so the
    * single-partition cumulative window is safe at any input scale
    * (the 100 TB corpus still collapses to the same bounded grid).
    *
    * Arithmetic: each CDF is floored into ppm PER SIDE
    * (`(cum·10⁶) div n` — BIGINT-safe while a population stays under
    * ~9.2·10¹² rows, comfortably past 100 TB of documents) and the gap
    * is the difference of the two floored ratios. That bounds the
    * quantization error at 1 ppm per side — irrelevant for a drift
    * monitor — where the cross-multiplied form `cum_a·n_b − cum_b·n_a`
    * overflows BIGINT once each population reaches ~3·10⁹ rows.
    * Contract: if either population is absent, `ks_e6` is NULL (never a
    * divide-by-zero); if both are absent the result has zero rows.
    * NULL values (or failed long casts) are excluded before the grid —
    * a NULL is not a point on a value axis, and engines disagree on
    * where it would sort in the cumulative walk (Spark nulls-first,
    * DuckDB nulls-last), so admitting it would shift both CDFs.
    */
  def ksDriftE6(
      df: DataFrame,
      pop: Column,
      v: Column,
      popA: String,
      popB: String): DataFrame = {
    val grid = df.select(pop.as("p"), v.cast("long").as("v"))
      .filter((col("p") === popA || col("p") === popB) && col("v").isNotNull)
      .groupBy("v")
      .agg(
        sum(when(col("p") === popA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("p") === popB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.select(
      col("v"),
      sum(col("ca")).over(w).as("cum_a"),
      sum(col("cb")).over(w).as("cum_b"))
    val totals = grid.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      count(lit(1)).as("n_grid"))
    cum.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("n_grid"),
        when(col("n_a") > 0 && col("n_b") > 0,
          abs(expr("(cum_a * 1000000L) div n_a - (cum_b * 1000000L) div n_b")))
          .as("gap_e6"))
      .groupBy("n_a", "n_b", "n_grid")
      .agg(max(col("gap_e6")).as("ks_e6"))
      .select("n_a", "n_b", "n_grid", "ks_e6")
  }
}
