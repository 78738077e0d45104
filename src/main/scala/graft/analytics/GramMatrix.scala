package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Gram matrix: G = Xᵀ·X over a vector column — the
  * covariance/PCA/whitening precursor every embedding-curation pipeline
  * needs (decorrelating features, condition-number checks, low-rank
  * projection fitting).
  *
  * Scale shape — the declarative form of MLlib's
  * `RowMatrix.computeGramianMatrix` tree-aggregation: each row expands
  * to its d·(d+1)/2 upper-triangle products INSIDE whole-stage codegen
  * (a nested `transform` + one `explode` — no self-join, no shuffle of
  * the matrix), and partial aggregation collapses every partition to at
  * most d² cells BEFORE the exchange. The shuffle volume is
  * O(partitions · d²), independent of row count N — at 100 TB the N×d
  * matrix is never moved, only d×d partials are. Row count enters only
  * through the map-side combine, which is embarrassingly parallel.
  *
  * Values are integer-quantized (`round(x·scale)` per element) so the
  * cell sums are EXACT integers — float summation order can never
  * diverge between executors, between runs, or against the DuckDB
  * oracle. With |q| ≤ scale·max|x| ≈ 4·10³, a 2⁶³ long holds ~5·10¹¹
  * row-contributions per cell before overflow — beyond that, re-scale
  * or lift to decimal.
  */
object GramMatrix {

  /** Upper-triangle Gram cells `(i, j, g)` for 0 ≤ i ≤ j < d, with
    * `g = Σ_rows q[i]·q[j]` over `q = round(vec·scale)::long`. Output
    * is d·(d+1)/2 rows regardless of N, ordered (i, j).
    */
  def upperTriangle(df: DataFrame, vec: Column, scale: Int): DataFrame = {
    // explicit double widening: Spark coerces float*int to DOUBLE while
    // DuckDB keeps FLOAT, and a .5-boundary float (present at sf0.1)
    // rounds differently between the two paths — see Similarity.quantize
    val q = transform(vec, x => round(x.cast("double") * lit(scale)).cast("long"))
    // pairs within one row, generated in codegen: for element i, pair
    // it with elements i..d-1 via a 1-based slice; the inner index j0
    // is the offset so the absolute column is i + j0
    val pairs = df.select(q.as("qe")).select(explode(expr(
      """flatten(transform(qe, (xi, i) ->
        |  transform(slice(qe, i + 1, size(qe) - i), (xj, j0) ->
        |    struct(i, i + j0 AS j, xi * xj AS p))))""".stripMargin)).as("c"))
    pairs
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).as("g"))
      .orderBy("i", "j")
  }
}
