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
    *
    * CONTRACT (enforced below): leg names must be distinct — they
    * become output column names — and each leg must be a RANKED LIST,
    * at most one row per (query_id, candidate_id). Callers producing
    * legs with `row_number` satisfy this by construction; a leg with
    * duplicate keys would have its duplicates collapsed by the
    * union+groupBy formulation (max rank per key) where the old
    * left-join spine fanned them out.
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], k0: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(k0 >= 0, s"k0 must be non-negative: $k0")
    require(legs.map(_._1).distinct.size == legs.size,
      s"rrfFuse leg names must be distinct: ${legs.map(_._1).mkString(", ")}")
    // One union + one grouped aggregate, not distinct-keys + a LEFT
    // JOIN per leg (r19 §2.2): each leg is a ranked list — at most one
    // row per (query_id, candidate_id) — so padding every leg to the
    // full rank-column set with nulls and taking max per key is
    // result-identical to the join spine (max over {rank, null} is the
    // rank; a leg that missed the candidate stays null → 0 below), and
    // the whole fusion costs ONE shuffle on the candidate key instead
    // of 1 + |legs| (the q242 plan's last remaining SMJ pair).
    val names = legs.map(_._1)
    val padded = legs.map { case (name, df) =>
      df.select(
        Seq(col("query_id"), col("candidate_id")) ++ names.map { n =>
          (if (n == name) col("rank").cast("long")
           else lit(null).cast("long")).as(s"rank_$n")
        }: _*)
    }
    val aggCols = names.map(n => max(col(s"rank_$n")).as(s"rank_$n"))
    val fused = padded.reduce(_ unionByName _)
      .groupBy("query_id", "candidate_id")
      .agg(aggCols.head, aggCols.tail: _*)
    val contribution = names.map { name =>
      coalesce(expr(s"1000000 div ($k0 + rank_$name)"), lit(0L))
    }.reduce(_ + _)
    names.foldLeft(fused.withColumn("rrf_ppm", contribution.cast("long"))) {
      case (acc, name) =>
        acc.withColumn(s"rank_$name",
          coalesce(col(s"rank_$name"), lit(0L)))
    }
  }
}
