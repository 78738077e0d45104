package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) — the standard way production search
  * combines heterogeneous retrieval legs (lexical BM25 + dense ANN)
  * without score calibration: each leg contributes 1/(k₀ + rank) for
  * the candidates it returned, and candidates missing from a leg
  * simply get nothing from it. Rank-only fusion is exactly what makes
  * hybrid retrieval robust — BM25 scores and cosines live on
  * incomparable scales, but their RANKS always fuse.
  *
  * Determinism: contributions are exact integers, 10⁶ div (k₀+rank)
  * — the classic k₀=60 gives distinct integer weights for every rank
  * that matters (16393, 16129, …), so fused order is engine-portable
  * with no float summation anywhere.
  *
  * Scale shape: each leg relation is |queries|·k rows — the legs were
  * already top-k-bounded by their own retrieval (a leg that ISN'T
  * bounded is the bug, not the fusion). The fusion is a union of leg
  * keys plus one left equi-join per leg on (query, candidate); no
  * corpus-sized relation enters.
  */
object HybridRetrieval {

  /** Fuses retrieval legs. Each leg is (name, df) where df has
    * columns (query_id, candidate_id, rank); rank is 1-based within
    * query. Returns (query_id, candidate_id, rrf_ppm, rank_<name>…)
    * with 0 in `rank_<name>` when the leg did not return the
    * candidate.
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], k0: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(k0 >= 0, s"k0 must be non-negative: $k0")
    val keyed = legs.map { case (name, df) =>
      name -> df.select(
        col("query_id"), col("candidate_id"),
        col("rank").cast("long").as(s"rank_$name"))
    }
    val keys = keyed.map(_._2.select("query_id", "candidate_id"))
      .reduce(_ unionByName _).distinct()
    val joined = keyed.foldLeft(keys) { case (acc, (name, df)) =>
      acc.join(df, Seq("query_id", "candidate_id"), "left")
    }
    val contribution = keyed.map { case (name, _) =>
      coalesce(expr(s"1000000 div ($k0 + rank_$name)"), lit(0L))
    }.reduce(_ + _)
    keyed.foldLeft(joined.withColumn("rrf_ppm", contribution.cast("long"))) {
      case (acc, (name, _)) =>
        acc.withColumn(s"rank_$name",
          coalesce(col(s"rank_$name"), lit(0L)))
    }
  }
}
