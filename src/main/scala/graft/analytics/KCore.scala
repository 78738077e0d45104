package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-core peeling: iteratively remove nodes of degree < k (with their
  * incident edges) until the remaining subgraph — the k-core — has
  * minimum degree ≥ k. The classic corpus-graph density filter: on a
  * token co-occurrence graph it strips the long tail of rare-word
  * periphery, on a near-dup graph it isolates the heavily-replicated
  * cores worth human review.
  *
  * Scale shape per round: one degree aggregate (map-side combined) and
  * two left-semi joins restricting the edge list — the graph is never
  * collected, never all-paired, and each round's edge set only
  * shrinks. Lineage is cut per round (`localCheckpoint`) exactly like
  * the CC/label-propagation operators, or iterative plan growth would
  * compound. Rounds needed = peeling depth of the graph (≤ its
  * degeneracy ordering length, usually tiny for power-law corpora).
  */
object KCore {

  /** Exactly `rounds` peel iterations (no convergence test) — the
    * bounded form the q168 oracle unrolls as CTEs. Returns the
    * per-node degrees of the surviving subgraph.
    */
  def peelBounded(
      edges: DataFrame, u: Column, v: Column,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 0, s"need k >= 1, rounds >= 0; got $k, $rounds")
    var e = edges.select(u.as("u"), v.as("v"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select("n")
      e = e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
    }
    degrees(e)
  }

  /** Peel to the FIXPOINT — the true k-core. Runs bounded rounds in
    * batches and stops when an edge-count round trip shows no change.
    */
  def kCore(edges: DataFrame, u: Column, v: Column, k: Int): DataFrame = {
    var e = edges.select(u.as("u"), v.as("v"))
    var prevCount = -1L
    var count = e.count()
    while (count != prevCount) {
      val keep = degrees(e).filter(col("deg") >= k).select("n")
      e = e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      prevCount = count
      count = e.count()
    }
    degrees(e)
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
}
