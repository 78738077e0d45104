package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CurationSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("splitBucket is stable, in-range, and label thresholds hold") {
    val d = df((0L until 50L).map(i => i -> s"doc $i"): _*)
    val bucket = Curation.splitBucket(col("doc_id"))
    val r = d.select(col("doc_id"), bucket.as("b"),
      Curation.splitLabel(bucket, 80, 10).as("s")).collect()
    assert(r.forall(x => x.getLong(1) >= 0 && x.getLong(1) < 100))
    assert(r.forall { x =>
      val b = x.getLong(1)
      x.getString(2) == (if (b < 80) "train" else if (b < 90) "val" else "test")
    })
    // identical to a re-computation (deterministic, content-only)
    val again = d.select(Curation.splitBucket(col("doc_id"))).collect().map(_.getLong(0))
    assert(r.map(_.getLong(1)).sameElements(again))
  }

  test("repetitionRatio: 0 for distinct grams, rises with loops, 0 for short docs") {
    val r = df(
      1L -> "a b c d e f",          // 4 grams, all distinct
      2L -> "a b a b a b a b",      // looping text
      3L -> "x y")                  // short fallback: single gram
      .select(col("doc_id"), Curation.repetitionRatio(col("text")).as("r"))
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(1) == 0.0)
    assert(r(1).getDouble(1) > 0.5)
    assert(r(2).getDouble(1) == 0.0)
  }

  test("contamination reports overlap counts and ratios for hit docs only") {
    val corpus = df(
      10L -> "the quick brown fox jumps",   // shares "the quick brown", "quick brown fox"
      11L -> "totally unrelated words here p q r")
    val bench = df(1L -> "the quick brown fox")
    val r = Curation.contamination(
      corpus, col("doc_id"), col("text"), bench, col("text")).collect()
    assert(r.length == 1 && r(0).getLong(0) == 10L)
    assert(r(0).getLong(2) == 2L) // n_overlap
    assert(r(0).getDouble(3) == 2.0 / 3.0)
  }
}
