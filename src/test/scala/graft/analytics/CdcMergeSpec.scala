package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CdcMergeSpec extends AnyFunSuite with SparkTestSession {

  test("apply-changes: last writer wins, deletes remove, base survives") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      // k=1: update then delete (delete wins)
      (1L, "a2", 1L, "upsert"), (1L, null.asInstanceOf[String], 2L, "delete"),
      // k=2: two updates (seq 2 wins)
      (2L, "b2", 1L, "upsert"), (2L, "b3", 2L, "upsert"),
      // k=4: insert of a new key
      (4L, "d", 1L, "upsert"),
      // k=5: delete of a key that never existed (no output row)
      (5L, null.asInstanceOf[String], 1L, "delete")
    ).toDF("k", "v", "seq", "op")
    val out = CdcMerge.applyChanges(base, changes, "k", col("seq"), col("op"), Seq("v"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((2L, "b3", 2L), (3L, "c", 0L), (4L, "d", 1L)))
  }

  test("histogram buckets partition the input exactly (incl. negatives)") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => i * 7 % 997 - 300).toDF("v")
    val h = Histogram.equiWidth(df, col("v"), 100L).collect()
    assert(h.map(_.getLong(3)).sum === 1000L)
    h.foreach { r =>
      val (bucket, lo, hi, mn, mx) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(lo === bucket * 100 && hi === lo + 100)
      assert(mn >= lo && mx < hi && mn <= mx)
    }
    // buckets are disjoint and cover every distinct value's bucket
    assert(h.map(_.getLong(0)).distinct.length === h.length)
  }
}
