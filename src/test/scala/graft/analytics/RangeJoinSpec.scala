package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  test("binned containment join equals the naive theta join, at any bin width") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (0L until 300L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "x")
    val intervals = (0L until 40L).map { i =>
      val lo = rnd.nextInt(950).toLong
      (i, lo, lo + rnd.nextInt(120).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for (width <- Seq(1L, 37L, 128L, 5000L)) {
      val binned = RangeJoin.binnedIntervalJoin(points, "x", intervals, "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(binned.sameElements(naive), s"width=$width")
    }
    assert(naive.nonEmpty)
  }

  test("boundary points match inclusively and each match appears exactly once") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 20L), (3L, 15L), (4L, 21L)).toDF("pid", "x")
    val intervals = Seq((100L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, "x", intervals, "lo", "hi", 7L)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L)))
  }

  test("the plan is an equi-join on the bin, not a nested loop") {
    import spark.implicits._
    val points = (0L until 50L).map(i => (i, i * 3)).toDF("pid", "x")
    val intervals = (0L until 5L).map(i => (i, i * 20, i * 20 + 15)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.binnedIntervalJoin(points, "x", intervals, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }
}
