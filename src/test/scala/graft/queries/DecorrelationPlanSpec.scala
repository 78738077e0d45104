package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape guards for the decorrelation gates (q140–q143): the
  * oracle proves the ANSWERS right, these prove the PLANS stay the
  * ones designed for 100 TB — a silent regression to a nested-loop or
  * a lost broadcast would still produce green oracle rows, just 1000×
  * slower at scale.
  */
class DecorrelationPlanSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def assertNoCross(plan: String, name: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$name degenerated to a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$name degenerated to a nested loop:\n$plan")
  }

  test("q140: brand semi-join and agg-back both broadcast; fact scanned once") {
    val plan = finalPlan("q140_small_qty_revenue")
    assertNoCross(plan, "q140")
    // executed-plan grammar: "BroadcastHashJoin [keys], [keys], <type>"
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], LeftSemi".r
      .findFirstIn(plan).isDefined,
      s"brand filter not a broadcast semi-join:\n$plan")
    // the per-part aggregate returns to the SAME persisted relation
    // via a broadcast hash join carrying the integral threshold
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], Inner".r
      .findFirstIn(plan).isDefined,
      s"agg-back join not broadcast:\n$plan")
    assert(plan.contains("InMemoryRelation"),
      s"brand-filtered fact not persisted (would re-scan):\n$plan")
  }

  test("q141: HAVING aggregate is map-side combined and top-100 avoids a global sort") {
    val plan = finalPlan("q141_large_volume_orders")
    assertNoCross(plan, "q141")
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT 100 fell back to a global sort:\n$plan")
    assert(plan.contains("partial_sum"),
      s"per-order aggregate lost its map-side combine:\n$plan")
  }

  test("q142: EXISTS/NOT EXISTS stay semi/anti equi-joins") {
    val plan = finalPlan("q142_waiting_suppliers")
    assertNoCross(plan, "q142")
    assert(plan.contains("LeftSemi"), s"EXISTS not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"late-line relation not persisted for its two consumers:\n$plan")
  }

  test("q143: scalar threshold broadcasts; dormancy is an anti join") {
    val plan = finalPlan("q143_dormant_rich_customers")
    // the one-row (sum, cnt) aggregate may legally plan as a broadcast
    // nested loop (it IS a 1-row cross join); the anti join must not
    assert(plan.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unbounded cartesian in q143:\n$plan")
  }
}
