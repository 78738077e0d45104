package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HyperLogLog + Count-Min: the two round-9 mergeable summaries.
  * Both are exercised through SQL against the session-registered
  * functions, across forced partial/merge paths (repartition before
  * aggregate), because the merge correctness IS the scale claim.
  */
class SketchAggSpec extends AnyFunSuite with SparkTestSession {

  // ---------------- HyperLogLog ----------------

  test("hll struct is identical across partition counts (merge = max)") {
    import spark.implicits._
    val base = (1L to 20000L).toDF("id")
      .selectExpr("id % 3 AS g", "md5_prefix60(CAST(id AS STRING)) AS h")
    def run(parts: Int) = {
      base.repartition(parts).createOrReplaceTempView("hll_in")
      spark.sql(
        """SELECT g, graft_hll(h, 1024) AS s FROM hll_in
           GROUP BY g ORDER BY g""").collect().toSeq
    }
    assert(run(1) === run(13))
  }

  test("hll estimate tracks true cardinality within 6% at n >> m") {
    import spark.implicits._
    val n = 50000L
    val est = (1L to n).toDF("id")
      .selectExpr("md5_prefix60(CAST(id AS STRING)) AS h")
      .selectExpr("graft_hll(h, 1024).est AS est")
      .head().getLong(0)
    // standard error ~1.04/sqrt(1024) ~ 3.3%; allow ~2 sigma
    assert(math.abs(est - n).toDouble / n < 0.065,
      s"hll estimate $est too far from true $n")
  }

  test("hll empty-register count + exact harmonic denominator invariants") {
    import spark.implicits._
    // one distinct value -> exactly one register occupied; S' =
    // (m-1)*2^60 + 2^(60-rho) with rho >= 1 -> strictly below m*2^60.
    val row = Seq(7L).toDF("id")
      .selectExpr("md5_prefix60(CAST(id AS STRING)) AS h")
      .selectExpr("graft_hll(h, 64).v AS v", "graft_hll(h, 64).s_scaled AS s")
      .head()
    assert(row.getLong(0) === 63L)
    val s = row.getDecimal(1)
    val full = new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(60).multiply(
        java.math.BigInteger.valueOf(64)))
    assert(s.compareTo(full) < 0)
  }

  test("hll rejects non-bigint input and non-literal m") {
    import spark.implicits._
    Seq("x").toDF("s").createOrReplaceTempView("hll_bad")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_hll(s, 64) FROM hll_bad").collect()
    }
    assert(e1.getMessage.contains("bigint"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_hll(length(s), length(s)) FROM hll_bad").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("hll rejects a non-power-of-two register count") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hll(CAST(1 AS BIGINT), 100)").collect()
    }
    assert(e.getMessage.contains("power of two"))
  }

  // ---------------- Count-Min ----------------

  private val bucketExpr =
    "transform(sequence(0, 3), d -> " +
      "md5_prefix60(concat(CAST(d AS STRING), '|', t)) % 64)"

  test("cms never undercounts, and is exact when width kills collisions") {
    import spark.implicits._
    val items = (1L to 3000L).map(i => s"tok${i % 40}")
    val df = items.toDF("t").repartition(7)
    df.createOrReplaceTempView("cms_in")
    val out = spark.sql(
      s"""WITH b AS (SELECT t, $bucketExpr AS bk FROM cms_in),
          sk AS (SELECT graft_cms_agg(bk, 4, 64) AS s FROM b),
          truth AS (SELECT t, CAST(count(*) AS BIGINT) AS n
                    FROM cms_in GROUP BY 1)
          SELECT truth.t, truth.n,
                 graft_cms_query(sk.s, $bucketExpr) AS est
          FROM truth CROSS JOIN sk""").collect()
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}: est ${r.getLong(2)} < ${r.getLong(1)}")
    }
    // 40 distinct items in a 4x64 grid: min-over-depth collisions are
    // possible but total error is bounded by N/width per the sketch
    // guarantee (here 3000/64 ~ 47 per depth; min usually exact)
    val n = 3000L
    out.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) <= n / 64 * 4,
        s"CMS error above bound for ${r.getString(0)}")
    }
  }

  test("cms merges across partitions identically to a single partition") {
    import spark.implicits._
    val items = (1L to 5000L).map(i => s"w${i % 97}")
    def sketch(parts: Int): Array[Byte] = {
      items.toDF("t").repartition(parts).createOrReplaceTempView("cms_m")
      spark.sql(
        s"""WITH b AS (SELECT t, $bucketExpr AS bk FROM cms_m)
            SELECT graft_cms_agg(bk, 4, 64) AS s FROM b""")
        .head().getAs[Array[Byte]](0)
    }
    assert(sketch(1).toSeq === sketch(11).toSeq)
  }

  test("cms rejects a wrong-length bucket array at update and query") {
    import spark.implicits._
    Seq("a").toDF("t").createOrReplaceTempView("cms_bad")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_cms_agg(array(CAST(1 AS BIGINT)), 4, 64)
           FROM cms_bad""").collect()
    }
    assert(e.getMessage.contains("4 bucket indices"))
  }

  // ---------------- KMV ----------------

  test("kmv keeps the k smallest DISTINCT values, stable across partitioning") {
    import org.apache.spark.sql.functions.{col, udaf}
    import spark.implicits._
    val kmv = udaf(new KmvSketchAgg(8))
    // duplicates everywhere: values 1..20 each appearing 50 times
    val vals = (0 until 1000).map(i => (i % 20 + 1).toLong)
    def run(parts: Int) =
      vals.toDF("v").repartition(parts)
        .agg(kmv(col("v")).as("sk")).head().getSeq[Long](0)
    assert(run(1) === (1L to 8L))
    assert(run(9) === (1L to 8L))
  }

  test("kmv with fewer than k distinct values returns the exact set") {
    import org.apache.spark.sql.functions.{col, udaf}
    import spark.implicits._
    val kmv = udaf(new KmvSketchAgg(64))
    val got = Seq(5L, 3L, 5L, 9L).toDF("v")
      .agg(kmv(col("v"))).head().getSeq[Long](0)
    assert(got === Seq(3L, 5L, 9L))
  }

  test("cms query rejects an out-of-range bucket index") {
    import spark.implicits._
    Seq("a").toDF("t").createOrReplaceTempView("cms_oor")
    val e = intercept[Exception] {
      spark.sql(
        s"""WITH b AS (SELECT t, $bucketExpr AS bk FROM cms_oor),
            sk AS (SELECT graft_cms_agg(bk, 4, 64) AS s FROM b)
            SELECT graft_cms_query(sk.s,
              array(CAST(99 AS BIGINT), CAST(0 AS BIGINT),
                    CAST(0 AS BIGINT), CAST(0 AS BIGINT)))
            FROM sk""").collect()
    }
    assert(e.getMessage.contains("out of range"))
  }
}
