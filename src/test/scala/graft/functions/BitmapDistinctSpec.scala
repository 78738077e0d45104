package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BitmapDistinctSpec extends AnyFunSuite with SparkTestSession {

  test("occupied count equals COUNT(DISTINCT bucket) across partitions") {
    import spark.implicits._
    // 8 input partitions force the partial/merge path: buffers are
    // serialized, shuffled, and OR-merged before eval.
    val df = (1L to 5000L).toDF("id").repartition(8)
      .selectExpr("id % 7 AS g", "md5_prefix60(CAST(id AS STRING)) AS h")
    df.createOrReplaceTempView("bd_input")
    val got = spark.sql(
      """SELECT g, graft_bitmap_distinct(h, 1024) AS occ
         FROM bd_input GROUP BY g ORDER BY g""").collect()
    val want = spark.sql(
      """SELECT g, CAST(count(DISTINCT pmod(h, 1024)) AS BIGINT) AS occ
         FROM bd_input GROUP BY g ORDER BY g""").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("nulls are ignored; empty group yields zero") {
    import spark.implicits._
    Seq((1, Some(42L)), (1, None), (2, None))
      .toDF("g", "h").createOrReplaceTempView("bd_nulls")
    val out = spark.sql(
      """SELECT g, graft_bitmap_distinct(h, 64) AS occ
         FROM bd_nulls GROUP BY g ORDER BY g""").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((1, 1L), (2, 0L)))
  }

  test("negative hashes land in [0, m) like the oracle's % on non-negatives") {
    import spark.implicits._
    // the function floor-mods; callers feed non-negative md5_prefix60
    // in the gate, but the contract must hold for any long
    Seq(-1L, -4096L, Long.MinValue).toDF("h")
      .createOrReplaceTempView("bd_neg")
    val out = spark.sql(
      "SELECT graft_bitmap_distinct(h, 4096) AS occ FROM bd_neg").head()
    assert(out.getLong(0) >= 1L && out.getLong(0) <= 3L)
  }

  test("linear-counting estimate tracks the true cardinality within 5%") {
    import spark.implicits._
    val m = 4096
    val n = 1200L // load factor ~0.3 — the sketch's design regime
    val occ = (1L to n).toDF("id")
      .selectExpr("md5_prefix60(CAST(id AS STRING)) AS h")
      .selectExpr(s"graft_bitmap_distinct(h, $m) AS occ")
      .head().getLong(0)
    val est = BitmapDistinct.linearCountEstimate(occ, m)
    assert(math.abs(est - n) / n < 0.05,
      s"estimate $est too far from true $n (occupied $occ)")
  }

  test("non-literal bucket argument is rejected") {
    import spark.implicits._
    Seq(1L).toDF("h").createOrReplaceTempView("bd_bad")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_bitmap_distinct(h, CAST(h AS INT)) FROM bd_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
