package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Exact quantiles of a quantized (integral) column via the
  * distinct-value grid — the memory-bounded alternative to
  * `percentile()`/`quantile_cont`, whose aggregation buffers hold every
  * raw value per group and OOM at corpus scale.
  *
  * Shape: ONE map-side-combined count shuffle onto the (group, value)
  * grid, a per-group cumulative walk, then one tiny min-aggregate per
  * requested quantile. State is bounded by the number of DISTINCT
  * quantized values per group — quantization-bounded, NOT corpus-
  * bounded — so a 100 TB column with e2-quantized money still
  * collapses to a few-thousand-row grid per group. The q60/q116/q117
  * gates keep `percentile()` for reference parity; this operator is
  * the documented swap once per-group value counts stop fitting an
  * aggregation buffer.
  *
  * Definition: quantile k/d (type-1, "lower") = the smallest v whose
  * cumulative count satisfies `cum·d ≥ k·n` — pure BIGINT predicates,
  * no interpolation, engine-portable by construction.
  *
  * Null contract: NULL values (or failed long casts) are EXCLUDED
  * before the grid — `n` counts non-null values only. Engines disagree
  * on where NULL sorts in a cumulative walk (Spark nulls-first, DuckDB
  * nulls-last), so admitting them would shift every CDF point; SQL
  * aggregates drop nulls, and so does this.
  */
object GridQuantiles {

  /** @param quantiles output-column-name → (numerator, denominator),
    *                  e.g. `Seq("p50" -> (1, 2), "p95" -> (19, 20))`
    * @return one row per group: `g`, `n`, then one exact quantile
    *         column per requested name
    */
  def exact(
      df: DataFrame,
      grp: Column,
      v: Column,
      quantiles: Seq[(String, (Int, Int))]): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile required")
    quantiles.foreach { case (name, (k, d)) =>
      // A fraction outside (0, 1] makes `cum·d ≥ k·n` unsatisfiable and
      // the conditional min would silently NULL the column — fail loud.
      require(d > 0 && k > 0 && k <= d,
        s"quantile '$name' must satisfy 0 < k <= d, got $k/$d")
    }
    val grid = df.select(grp.as("g"), v.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = CacheScope.persist(
      grid.select(col("g"), col("v"), sum(col("c")).over(w).as("cum")))
    val tot = cum.groupBy("g").agg(max(col("cum")).as("n"))
    // Single pass over the grid for ALL requested quantiles: one
    // cum ⋈ tot join, then one conditional min per quantile inside the
    // same aggregate — plan shape is independent of the quantile count
    // (the fold-of-joins alternative pays one join per quantile).
    val qCols = quantiles.map { case (name, (k, d)) =>
      min(when(col("cum") * d >= col("n") * k, col("v"))).as(name)
    }
    cum.join(tot, "g")
      .groupBy("g")
      .agg(max(col("n")).as("n"), qCols: _*)
  }
}
