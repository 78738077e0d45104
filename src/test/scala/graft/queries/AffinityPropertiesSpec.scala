package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property coverage for the session-4 prep operators whose end-to-end
  * shapes are oracle-gated (q262/q263/q264): each pins the LIBRARY
  * semantics against a brute-force re-computation on seeded random
  * input — the grid join must find exactly the brute-force pair set,
  * the sweep-line coverage must equal pointwise union length, and the
  * LOO encoding must equal the literal leave-one-out mean.
  */
class AffinityPropertiesSpec extends AnyFunSuite with SparkTestSession {

  private val rnd = new scala.util.Random(20260814L)

  test("grid 3x3 probe join finds exactly the brute-force pair set") {
    import spark.implicits._
    val r = 50L
    for (trial <- 1 to 5) {
      val n = 40 + rnd.nextInt(40)
      // cluster points so some pairs are near (grid 0..1000 with r=50)
      val pts = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)
      }
      val expected = (for {
        a <- pts; b <- pts if a._1 < b._1
        dx = a._2 - b._2; dy = a._3 - b._3
        if dx * dx + dy * dy <= r * r
      } yield (a._1, b._1)).toSet

      val df = pts.toDF("k", "x", "y")
        .withColumn("cx", expr(s"x div $r"))
        .withColumn("cy", expr(s"y div $r"))
      val offsets = spark.range(9).select(
        expr("id % 3 - 1").as("dx"), expr("id div 3 - 1").as("dy"))
      val probe = df.crossJoin(broadcast(offsets))
        .select(col("k").as("ka"), col("x").as("xa"), col("y").as("ya"),
          (col("cx") + col("dx")).as("jx"), (col("cy") + col("dy")).as("jy"))
      val got = probe.join(
          df.select(col("k").as("kb"), col("x").as("xb"), col("y").as("yb"),
            col("cx").as("jx"), col("cy").as("jy")),
          Seq("jx", "jy"))
        .filter(col("ka") < col("kb"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) <= r * r)
        .select("ka", "kb").collect()
        .map(row => (row.getLong(0), row.getLong(1)))
      // exactly once each: the multiset has no duplicates and equals
      // the brute-force set
      assert(got.length === got.toSet.size, s"trial $trial: duplicate pairs")
      assert(got.toSet === expected, s"trial $trial")
    }
  }

  test("sweep-line interval coverage equals pointwise union length") {
    import spark.implicits._
    for (trial <- 1 to 5) {
      val iv = (0 until 30).map { i =>
        val t0 = rnd.nextInt(200).toLong
        (1L, t0, t0 + 1 + rnd.nextInt(40), i.toLong) // (user, t0, t1, id)
      }
      val expected = iv.flatMap { case (_, t0, t1, _) => t0 until t1 }
        .distinct.size.toLong
      iv.toDF("user_id", "t0", "t1", "event_id")
        .createOrReplaceTempView("p_cov")
      val got = spark.sql("""
        WITH flagged AS (SELECT user_id, t0, t1, event_id,
               CASE WHEN max(t1) OVER (PARTITION BY user_id
                      ORDER BY t0, t1, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      >= t0
                    THEN 0 ELSE 1 END AS new_island
             FROM p_cov),
        islands AS (SELECT user_id, t0, t1,
               sum(new_island) OVER (PARTITION BY user_id
                 ORDER BY t0, t1, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             FROM flagged),
        per_island AS (SELECT user_id, island, max(t1) - min(t0) AS cov
             FROM islands GROUP BY 1, 2)
        SELECT CAST(sum(cov) AS BIGINT) FROM per_island""").head().getLong(0)
      assert(got === expected, s"trial $trial")
    }
  }

  test("LOO target encoding equals the literal leave-one-out mean") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      (i.toLong, "c" + rnd.nextInt(4), rnd.nextInt(2).toLong)
    }
    rows.toDF("id", "cat", "y").createOrReplaceTempView("p_loo")
    val got = spark.sql("""
      WITH agg AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_c,
                          CAST(sum(y) AS BIGINT) AS s_c
                   FROM p_loo GROUP BY 1)
      SELECT p.id, (agg.s_c - p.y) * 1000000 div (agg.n_c - 1) AS loo
      FROM p_loo p JOIN agg ON p.cat = agg.cat
      WHERE agg.n_c > 1""").collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    rows.foreach { case (id, cat, y) =>
      val others = rows.filter(r => r._2 == cat && r._1 != id)
      if (others.nonEmpty) {
        val expect = others.map(_._3).sum * 1000000L / others.size
        assert(got(id) === expect, s"row $id")
      }
    }
  }
}
