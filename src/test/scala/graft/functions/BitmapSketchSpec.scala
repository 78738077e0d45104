package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BitmapSketchSpec extends AnyFunSuite with SparkTestSession {

  test("sketch algebra equals exact set algebra when m exceeds the key space") {
    import spark.implicits._
    // disjoint-ish groups with known overlap; m=4096 >> 60 keys means
    // bucket collisions are possible but both sides see the same
    // buckets — compare against exact DISTINCT-set algebra over buckets
    val rows = ((1 to 40).map(i => ("a", i.toLong)) ++
      (21 to 60).map(i => ("b", i.toLong))).toDF("g", "k")
    rows.createOrReplaceTempView("bs_rows")
    val out = spark.sql("""
      WITH sk AS (SELECT g, graft_bitmap_agg(
                    md5_prefix60(CAST(k AS STRING)), 4096) AS bm
                  FROM bs_rows GROUP BY g)
      SELECT a.g, b.g,
             graft_bitmap_popcount(a.bm) AS na,
             graft_bitmap_popcount(b.bm) AS nb,
             graft_bitmap_and_count(a.bm, b.bm) AS nand,
             graft_bitmap_or_count(a.bm, b.bm) AS nor
      FROM sk a JOIN sk b ON a.g < b.g""").head()
    def buckets(lo: Int, hi: Int): Set[Long] =
      (lo to hi).map(i => graft.llm.TextHash.jvmHash60(i.toString) % 4096).toSet
    val (sa, sb) = (buckets(1, 40), buckets(21, 60))
    assert(out.getLong(2) == sa.size && out.getLong(3) == sb.size)
    assert(out.getLong(4) == (sa intersect sb).size)
    assert(out.getLong(5) == (sa union sb).size)
  }

  test("and/or counts reject width-mismatched sketches") {
    import spark.implicits._
    Seq(("a", 1L), ("b", 2L)).toDF("g", "k").createOrReplaceTempView("bs_mix")
    val e = intercept[Exception] {
      spark.sql("""
        WITH s1 AS (SELECT graft_bitmap_agg(k, 64) AS bm FROM bs_mix),
             s2 AS (SELECT graft_bitmap_agg(k, 128) AS bm FROM bs_mix)
        SELECT graft_bitmap_and_count(s1.bm, s2.bm) FROM s1, s2""").collect()
    }
    assert(e.getMessage != null)
  }

  test("sketches OR-merge across partitionings identically") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toLong).toDF("k")
    def pop(parts: Int): Long = {
      df.repartition(parts).createOrReplaceTempView("bs_p")
      spark.sql(
        "SELECT graft_bitmap_popcount(graft_bitmap_agg(k, 512)) FROM bs_p")
        .head().getLong(0)
    }
    assert(pop(1) == pop(13))
  }

  test("graft_bitmap_or_agg re-aggregates per-group sketches without rows") {
    import spark.implicits._
    // 3 groups with overlapping keys; OR-merging the three group
    // sketches must equal the sketch built directly over all rows —
    // under any partitioning of the sketch relation.
    val rows = ((1 to 30).map(i => ("a", i.toLong)) ++
      (20 to 50).map(i => ("b", i.toLong)) ++
      (45 to 70).map(i => ("c", i.toLong))).toDF("g", "k")
    rows.createOrReplaceTempView("bs_oa")
    val direct = spark.sql(
      "SELECT graft_bitmap_popcount(graft_bitmap_agg(" +
        "md5_prefix60(CAST(k AS STRING)), 1024)) FROM bs_oa")
      .head().getLong(0)
    for (parts <- Seq(1, 7)) {
      val merged = spark.sql(
        s"""WITH sk AS (SELECT g, graft_bitmap_agg(
                          md5_prefix60(CAST(k AS STRING)), 1024) AS bm
                        FROM bs_oa GROUP BY g),
            p AS (SELECT /*+ REPARTITION($parts) */ bm FROM sk)
            SELECT graft_bitmap_popcount(graft_bitmap_or_agg(bm)) FROM p""")
        .head().getLong(0)
      assert(merged == direct, s"parts=$parts")
    }
  }

  test("graft_bitmap_or_agg: empty input yields an empty sketch, " +
    "width mismatch fails fast") {
    import spark.implicits._
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("bs_oa2")
    val empty = spark.sql(
      """SELECT graft_bitmap_popcount(graft_bitmap_or_agg(bm))
         FROM (SELECT graft_bitmap_agg(k, 64) AS bm FROM bs_oa2
               WHERE k > 100)""").head()
    assert(empty.getLong(0) == 0L)
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_bitmap_or_agg(bm) FROM (
             SELECT graft_bitmap_agg(k, 64) AS bm FROM bs_oa2
             UNION ALL
             SELECT graft_bitmap_agg(k, 128) AS bm FROM bs_oa2)""").collect()
    }
    assert(e.getMessage != null)
  }
}
