package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {

  private def frame(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "ts", "id")
  }

  test("asOf picks the most recent right row at-or-before each left ts") {
    val left = frame((1L, 100L, 10L), (1L, 200L, 11L), (1L, 50L, 12L))
    val right = frame((1L, 60L, 20L), (1L, 100L, 21L), (1L, 150L, 22L))
    val out = AsOfJoin.asOf(left, right, "k", "ts", "id", Seq("id", "ts"))
      .orderBy("id").collect()
    // left id=10 @100: right @100 matches (inclusive) -> id 21
    assert(out(0).getLong(2) == 10L && out(0).getLong(3) == 21L)
    // left id=11 @200: most recent right is @150 -> id 22
    assert(out(1).getLong(2) == 11L && out(1).getLong(3) == 22L)
    // left id=12 @50: nothing at-or-before -> null
    assert(out(2).getLong(2) == 12L && out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("keys never cross and right-side ties break by the id column") {
    val left = frame((1L, 100L, 1L), (2L, 100L, 2L))
    val right = frame(
      (1L, 90L, 30L), (1L, 90L, 31L), // tie at ts=90: id 31 wins
      (3L, 10L, 40L)) // other key, never visible
    val out = AsOfJoin.asOf(left, right, "k", "ts", "id", Seq("id"))
      .orderBy("id").collect()
    assert(out(0).getLong(0) == 1L && out(0).getLong(3) == 31L)
    assert(out(1).getLong(0) == 2L && out(1).isNullAt(3))
  }

  test("left payload columns ride through unchanged") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L, "buy", 9.5)).toDF("k", "ts", "id", "kind", "amt")
    val right = frame((1L, 90L, 20L))
    val out = AsOfJoin.asOf(left, right, "k", "ts", "id", Seq("id")).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("kind") == "buy" && r.getAs[Double]("amt") == 9.5)
    assert(r.getAs[Long]("asof_id") == 20L)
  }

  test("randomized equivalence with a sequential reference (incl. ts ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // small ts domain forces ties both within and across sides
    val left = (0L until 200L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i))
    val right = (1000L until 1150L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i))
    val got = AsOfJoin.asOf(
      left.toDF("k", "ts", "id"), right.toDF("k", "ts", "id"), "k", "ts", "id", Seq("id"))
      .collect().map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val want = left.map { case (k, ts, id) =>
      val m = right.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (m.isEmpty) -1L else m.maxBy(r => (r._2, r._3))._3)
    }.toMap
    assert(got == want)
  }

  test("plan shuffles once: a single Exchange on the key") {
    val left = frame((1L, 100L, 1L))
    val right = frame((1L, 90L, 2L))
    val plan = AsOfJoin.asOf(left, right, "k", "ts", "id", Seq("id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
