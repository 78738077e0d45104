package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Triangle counting over an undirected edge list — the
  * clustering-coefficient primitive, with the DEGREE orientation that
  * makes it survive power-law graphs.
  *
  * Orienting each edge from its lower-(degree, name) endpoint to its
  * higher one turns the wedge enumeration into "pairs of out-edges per
  * node", and the classic bound applies: after degree orientation every
  * node's out-degree is O(√|E|) (a node of degree d > √|E| can have at
  * most √|E| neighbors of equal-or-higher degree), so the wedge join's
  * per-key fan-out — the term that explodes on a hub node under a
  * name-based orientation — is bounded by √|E| regardless of skew. A
  * 10⁶-degree hub contributes ~10³ wedges instead of ~10¹². Each
  * triangle is counted exactly once: at its minimum-rank vertex, with
  * the remaining pair ordered by rank.
  *
  * Shape: one node-sized degree aggregate, two equi-joins to attach
  * endpoint degrees, then the wedge equi-join on the low vertex and one
  * closing equi-join — no theta join anywhere. Each public entry point
  * persists the edge relation ONCE and computes the degree aggregate
  * ONCE, shared by every consumer inside it.
  */
object Triangles {

  /** One row per canonical edge, columns pinned to (u, v) strings. */
  private def canonical(edges: DataFrame, u: Column, v: Column): DataFrame =
    edges.select(u.cast("string").as("u"), v.cast("string").as("v"))

  /** Undirected degree per node of a canonical edge relation. */
  def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))

  /** Orientation against a PRECOMPUTED degree relation (n, deg). */
  private def orientWith(e: DataFrame, deg: DataFrame): DataFrame = {
    val ru = struct(col("du").as("d"), col("u").as("w"))
    val rv = struct(col("dv").as("d"), col("v").as("w"))
    e.join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(ru < rv, col("u")).otherwise(col("v")).as("a"),
        when(ru < rv, rv).otherwise(ru).as("rb"))
  }

  /** Orient canonical undirected edges by (degree, name). Input: one
    * row per undirected edge, endpoints distinct, already deduplicated
    * (canonical u < v form or any one-row-per-edge encoding). Output:
    * `a` (lower-rank endpoint name) and `rb` = struct(d, w) — the
    * higher-rank endpoint's (degree, name) rank key, comparable across
    * rows because degree is a function of the node.
    */
  def orientByDegree(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val e = canonical(edges, u, v)
    orientWith(e, degrees(e))
  }

  /** One row per triangle (a, b, c), enumerated exactly once via the
    * degree-oriented wedge join: `a` is the minimum-rank corner, b/c
    * the remaining pair in rank order.
    */
  private def triangleCorners(oriented: DataFrame): DataFrame = {
    val wedgeHi = oriented.select(col("a").as("a2"), col("rb").as("r2"))
    val closing = oriented.select(col("a").as("a3"), col("rb").as("r3"))
    oriented.select(col("a"), col("rb").as("r1"))
      .join(wedgeHi, col("a") === col("a2") && col("r1") < col("r2"))
      .join(closing, col("a3") === col("r1.w") && col("r3") === col("r2"))
      .select(col("a"), col("r1.w").as("b"), col("r2.w").as("c"))
  }

  /** Per-node counts over an oriented relation's triangles. */
  private def cornersPerNode(oriented: DataFrame): DataFrame =
    triangleCorners(oriented)
      .select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))

  /** Count triangles of an undirected edge list (see [[orientByDegree]]
    * for the input contract). Returns ONE row: (n_triangles, n_edges).
    */
  def countTriangles(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val e = CacheScope.persist(canonical(edges, u, v))
    val o = CacheScope.persist(orientWith(e, degrees(e)))
    triangleCorners(o).agg(count(lit(1)).as("n_triangles"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
  }

  /** Per-node triangle participation: (n, n_tri) for every node that
    * closes at least one triangle — the input to local clustering
    * coefficients. Same enumeration as [[countTriangles]], with each
    * triangle exploded to its three corners and counted per node (one
    * node-keyed, map-side-combined shuffle over the triangle relation,
    * which degree orientation already bounded).
    */
  def trianglesPerNode(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val e = CacheScope.persist(canonical(edges, u, v))
    cornersPerNode(CacheScope.persist(orientWith(e, degrees(e))))
  }

  /** Local clustering coefficient per node in floored ppm:
    * (token, deg, n_tri, lcc_e6 = 2·tri·10⁶ div deg·(deg−1); 0 for
    * degree-1 nodes). One edge persist, one degree aggregate, one
    * oriented persist — shared by the enumeration and the coefficient.
    */
  def localClusteringE6(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val e = CacheScope.persist(canonical(edges, u, v))
    val deg = degrees(e)
    val tc = cornersPerNode(CacheScope.persist(orientWith(e, deg)))
    deg.join(tc, Seq("n"), "left")
      .select(col("n").as("token"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("""case when deg > 1
                then (2L * coalesce(n_tri, 0L) * 1000000L)
                     div (deg * (deg - 1))
                else 0L end""").as("lcc_e6"))
  }
}
