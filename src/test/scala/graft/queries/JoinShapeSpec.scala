package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape guards for the join-shape gates (q151–q158): the oracle
  * pins the answers, these pin the 100 TB plan properties — the
  * hand-derived disjunction pushdown actually reaching both scans, the
  * argmin/fraction-of-total decorrelations staying broadcast + single
  * fact scan, and the distinct count keeping its partial expansion.
  */
class JoinShapeSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def assertNoCross(plan: String, name: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$name degenerated to a cartesian product:\n$plan")
  }

  test("q156: OR-of-ANDs reaches BOTH scans as pushed filters") {
    val df = graft.SparkEntry.queries("q156_disjunctive_pushdown")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Two parquet scans, each with an Or chain in PushedFilters: the
    // part side on (brand, size), the lineitem side on quantity bands.
    val pushed = "PushedFilters: \\[[^\\]]*Or[^\\]]*\\]".r
      .findAllIn(plan).toList
    assert(pushed.size >= 2,
      s"expected Or in PushedFilters on both part and lineitem scans, " +
        s"found ${pushed.size}:\n$plan")
    assert(pushed.exists(_.contains("p_brand")),
      s"part-side disjunction not pushed:\n$plan")
    assert(pushed.exists(_.contains("l_quantity")),
      s"lineitem-side disjunction not pushed:\n$plan")
  }

  test("q151: argmin join-back is broadcast over one persisted fact scan") {
    val plan = finalPlan("q151_cheapest_supplier")
    assertNoCross(plan, "q151")
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], LeftSemi".r
      .findFirstIn(plan).isDefined,
      s"size-1 part filter not a broadcast semi-join:\n$plan")
    assert(plan.contains("InMemoryRelation") || plan.contains("InMemoryTableScan"),
      s"semi-filtered fact not persisted (min-agg and probe would re-scan):\n$plan")
  }

  test("q154: max-of-aggregate is a one-row broadcast, not a re-aggregation") {
    val plan = finalPlan("q154_top_supplier")
    assert(plan.contains("InMemoryTableScan") || plan.contains("InMemoryRelation"),
      s"per-supplier aggregate not persisted for its two consumers:\n$plan")
    assert(plan.contains("partial_sum"),
      s"revenue aggregate lost its map-side combine:\n$plan")
  }

  test("q155: distinct supplier count keeps partial expansion; exclusion is broadcast anti") {
    // sf0.01, not sf0.001: the smaller fixture has ZERO flagged
    // suppliers, and AQE's empty-relation propagation then (correctly)
    // erases the anti join from the final plan — the assertion needs a
    // non-empty build side to see the join shape at all.
    val df = graft.SparkEntry.queries("q155_supplier_counts")(
      spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assertNoCross(plan, "q155")
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], LeftAnti".r
      .findFirstIn(plan).isDefined,
      s"flagged-supplier exclusion not a broadcast anti-join:\n$plan")
    // two-phase distinct: a partial aggregate keyed by the distinct col
    // precedes the final count
    assert(plan.contains("partial_count(distinct"),
      s"COUNT(DISTINCT) lost its partial expansion:\n$plan")
  }

  test("q157: fraction-of-total reads the fact once; supplier side is all semi-joins") {
    val plan = finalPlan("q157_dominant_suppliers")
    assertNoCross(plan, "q157")
    assert(plan.contains("InMemoryRelation") || plan.contains("InMemoryTableScan"),
      s"per-(part,supp) aggregate not persisted (rollup would re-scan the fact):\n$plan")
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      s"supplier qualification lost a semi-join:\n$plan")
  }
}
