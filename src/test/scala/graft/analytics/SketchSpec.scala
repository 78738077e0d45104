package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Approximate-sketch surface: Spark's native HLL++ distinct-count and
  * t-digest percentile sketches, asserted against exact answers within
  * their error bounds. These are the documented swap-ins for the exact
  * operators at 100 TB (q17 distinct sets, q38/q60 percentiles) — the
  * gates stay exact because sketch outputs are not engine-portable;
  * this spec pins the accuracy contract of the swap.
  */
class SketchSpec extends AnyFunSuite with SparkTestSession {

  test("HLL++ approx distinct is within 5% of exact on 100k rows") {
    val df = spark.range(100000).select(pmod(col("id"), lit(37777)).as("k"))
    val exact = df.select("k").distinct().count()
    val approx = df.agg(approx_count_distinct("k", 0.02).as("a"))
      .head().getLong(0)
    assert(exact === 37777L)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("t-digest approx percentile lands within rank tolerance") {
    val df = spark.range(100001).toDF("v")
    val p50 = df.agg(expr("approx_percentile(v, 0.5, 1000)").as("p"))
      .head().getLong(0)
    // accuracy=1000 bounds rank error by n/1000 ≈ 100 rows
    assert(math.abs(p50 - 50000L) <= 1000L, s"p50=$p50")
  }
}
