package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ExactSubstringsSpec extends AnyFunSuite with SparkTestSession {

  private def counts(rows: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    ExactSubstrings.repeatedSpanCounts(
      rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
      window = 10, stride = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("spans shared across documents are counted per document") {
    val shared = "ABCDEFGHIJ" // exactly one 10-char window
    // doc 1 and 2 both contain `shared` aligned at a stride position;
    // doc 3 is unique text, doc 4 is too short to produce any window
    val res = counts(Seq(
      1L -> (shared + "11111"),
      2L -> (shared + "22222"),
      3L -> "zzzzzzzzzzzzzzz",
      4L -> "short"))
    assert(res === Map(1L -> 1L, 2L -> 1L))
  }

  test("within-document repeats alone do not qualify (cross-doc only)") {
    val rep = "ABCDEFGHIJ"
    // doc 1 repeats the window at two aligned strides — but no OTHER
    // document shares it, so nothing is reported
    val res = counts(Seq(
      1L -> (rep + rep), // windows at 1 and 11 are both `rep`... plus mixtures
      2L -> "uniqueuniqueunique"))
    assert(!res.contains(2L))
    // every reported count would need a second document; doc 1's
    // identical windows occur in one doc only
    assert(res.isEmpty)
  }

  test("identical documents report every aligned window") {
    val text = "ABCDEFGHIJKLMNO" // windows at 1 and 6: 2 windows
    val res = counts(Seq(1L -> text, 2L -> text))
    assert(res === Map(1L -> 2L, 2L -> 2L))
  }

  test("guards reject nonpositive window and stride") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      ExactSubstrings.repeatedSpanCounts(df, col("doc_id"), col("text"), 0, 5)
    }
    intercept[IllegalArgumentException] {
      ExactSubstrings.repeatedSpanCounts(df, col("doc_id"), col("text"), 10, 0)
    }
  }

  private def segCounts(rows: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    ExactSubstrings.sharedSegmentCounts(
      rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
      gram = 4, modulus = 4, minLen = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("CDC segmentation finds shared runs at MISALIGNED offsets") {
    // a shared run long enough to contain interior breakpoints,
    // planted at offsets that disagree mod any fixed stride — the case
    // the doc-aligned window grid is blind to, and the reason the CDC
    // variant exists. Boundaries derive from the run's own content, so
    // both documents cut it identically wherever it sits.
    val run = "The quick brown fox jumps over the lazy dog again and again" * 2
    val docA = "XY" + run + "PQRS"
    val docB = "0123456789012345678901234567890123456789012" + run + "Z"
    // sanity: the offsets disagree mod the q145 stride grid
    val strided = counts(Seq(1L -> docA, 2L -> docB))
    val cdc = segCounts(Seq(1L -> docA, 2L -> docB))
    assert(cdc.contains(1L) && cdc.contains(2L),
      s"CDC missed the misaligned shared run: $cdc (strided saw: $strided)")
    assert(cdc(1L) === cdc(2L)) // same interior segments on both sides
  }

  test("CDC segmentation reports nothing for disjoint corpora") {
    val res = segCounts(Seq(
      1L -> ("alpha bravo charlie delta echo foxtrot golf" * 3),
      2L -> ("nine eight seven six five four three two one" * 3)))
    assert(res.isEmpty)
  }

  test("identical documents share every qualifying segment") {
    val text = "Pack my box with five dozen liquor jugs, quickly now!" * 3
    val res = segCounts(Seq(1L -> text, 2L -> text))
    assert(res.get(1L).exists(_ >= 1L))
    assert(res.get(1L) === res.get(2L))
  }

  test("CDC guards reject nonpositive parameters") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    for ((g, m, l) <- Seq((0, 4, 8), (4, 0, 8), (4, 4, 0)))
      intercept[IllegalArgumentException] {
        ExactSubstrings.sharedSegmentCounts(df, col("doc_id"), col("text"), g, m, l)
      }
  }
}
