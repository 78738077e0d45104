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
}
