package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Passage dedup + token-graph PageRank semantics on controlled input
  * (oracle-gated end to end as q101/q111).
  */
class PassageDedupSpec extends AnyFunSuite with SparkTestSession {

  test("corpus-wide duplicate passages are removed from every document") {
    import spark.implicits._
    // 2-token passages; "x x" appears in docs 1 and 2 -> dropped from both.
    val docs = Seq(
      (1L, "x x a b"),
      (2L, "x x c d"),
      (3L, "e f g h i")) // trailing "i" is a partial window: never a passage
      .toDF("doc_id", "text")
    val out = PassageDedup.dedup(docs, col("doc_id"), col("text"), n = 2, maxOccur = 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "a b", 1L),
      (2L, "c d", 1L),
      (3L, "e f g h", 2L)))
  }

  test("a document of only duplicated passages survives with empty text") {
    import spark.implicits._
    val docs = Seq((1L, "x x"), (2L, "x x")).toDF("doc_id", "text")
    val out = PassageDedup.dedup(docs, col("doc_id"), col("text"), n = 2, maxOccur = 1L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "", 0L), (2L, "", 0L)))
  }

  test("documents shorter than the window produce zero passages, not a crash") {
    import spark.implicits._
    // Spark's sequence(1, 0) is a DESCENDING [1, 0]; these docs would
    // otherwise build a bogus window (or index element 0 in bigrams).
    val docs = Seq((1L, "solo"), (2L, "two tokens"), (3L, "a b c d")).toDF("doc_id", "text")
    val out = PassageDedup.dedup(docs, col("doc_id"), col("text"), n = 3, maxOccur = 1L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "", 0L), (2L, "", 0L), (3L, "a b c", 1L)))
    val edges = TokenGraph.bigramEdges(docs.filter(col("doc_id") === 1L), col("text"))
      .collect()
    assert(edges.isEmpty)
  }

  test("integer PageRank conserves ppm mass within quantization slack") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b"), (2L, "c a b a")).toDF("doc_id", "text")
    val pr = TokenGraph.pagerankE6(spark, docs, col("text"), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(pr.map(_._1).sorted.toSeq == Seq("a", "b", "c"))
    val mass = pr.map(_._3).sum
    // every `div` truncates at most 1 ppm per edge/node per round
    assert(mass > 900000L && mass <= 1000000L)
    // rank is deterministic: a second evaluation is identical
    val pr2 = TokenGraph.pagerankE6(spark, docs, col("text"), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(pr.sortBy(_._1).toSeq == pr2.sortBy(_._1).toSeq)
  }
}
