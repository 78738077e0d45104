package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[HybridRetrieval.rrfFuse]] behavior the q242 gate composes but
  * can't isolate: exact contribution weights, absent-leg zeros, and
  * the single-leg / custom-k₀ paths.
  */
class HybridRetrievalSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def leg(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "candidate_id", "rank")

  test("two-leg fusion sums exact 10^6 div (60+rank) contributions") {
    val dense = leg((1L, 10L, 1L), (1L, 11L, 2L))
    val lex = leg((1L, 11L, 1L), (1L, 12L, 2L))
    val out = HybridRetrieval.rrfFuse(Seq("dense" -> dense, "lex" -> lex))
      .collect().map(r => (r.getAs[Long]("candidate_id"),
        (r.getAs[Long]("rrf_ppm"), r.getAs[Long]("rank_dense"),
          r.getAs[Long]("rank_lex")))).toMap
    // 10: dense rank 1 only -> 1000000/61 = 16393
    assert(out(10L) == ((16393L, 1L, 0L)))
    // 11: dense rank 2 (16129) + lex rank 1 (16393) = 32522
    assert(out(11L) == ((32522L, 2L, 1L)))
    // 12: lex rank 2 only
    assert(out(12L) == ((16129L, 0L, 2L)))
  }

  test("candidate present in both legs appears once (key union, not concat)") {
    val a = leg((1L, 5L, 1L))
    val b = leg((1L, 5L, 3L))
    val rows = HybridRetrieval.rrfFuse(Seq("a" -> a, "b" -> b)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("rrf_ppm") == 16393L + 15873L)
  }

  test("single leg and custom k0") {
    val a = leg((7L, 1L, 1L), (7L, 2L, 2L))
    val out = HybridRetrieval.rrfFuse(Seq("only" -> a), k0 = 0)
      .collect().map(r => r.getAs[Long]("candidate_id") ->
        r.getAs[Long]("rrf_ppm")).toMap
    assert(out == Map(1L -> 1000000L, 2L -> 500000L))
  }
}
