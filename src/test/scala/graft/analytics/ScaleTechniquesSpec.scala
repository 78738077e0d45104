package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The two scale techniques that can't show up in the oracle queries:
  * salted aggregation (skewed keys) and bucketed co-located joins
  * (shuffle-free repeated joins).
  */
class ScaleTechniquesSpec extends AnyFunSuite with SparkTestSession {

  test("salted aggregation equals plain aggregation under heavy skew") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    val skewed = (Seq.fill(10000)("hot") ++ (1 to 500).map(i => s"k$i"))
      .toDF("k").withColumn("x", lit(1L))
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewedAgg.saltedCount(skewed, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    val general = SkewedAgg.saltedAgg(skewed, col("k"),
      partials = Seq(count(lit(1)).as("c"), sum(col("x")).as("s")),
      merges = Seq(sum(col("c")).as("cnt"), sum(col("s")).as("total")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(general.forall { case (k, cnt, total) => plain(k) == cnt && cnt == total })
  }

  test("bucketed tables join with zero exchanges") {
    val warehouse = Files.createTempDirectory("graft-warehouse")
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.sources.BucketedTables.ensure(spark,
      graft.Tables.orders(spark, dir), "b_orders",
      "o_orderkey", 8, s"$warehouse/b_orders")
    graft.sources.BucketedTables.ensure(spark,
      graft.Tables.lineitem(spark, dir), "b_lineitem",
      "l_orderkey", 8, s"$warehouse/b_lineitem")

    // force the sort-merge path (AQE would broadcast these tiny tables
    // and hide the bucketing effect this test demonstrates)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucket-local sort-merge: the join inputs need no shuffle — the
      // only exchange in the plan belongs to the post-join aggregation
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"join input shuffled:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join input shuffled:\n$plan")
      // Note: Spark ≥3.0 keeps SMJ's Sort nodes even over sortBy'd
      // buckets (trusting file sort order is behind the legacy
      // bucketedTableScan.outputOrdering flag); the sort of an
      // already-sorted run is a cheap linear pass — the expensive part,
      // the Exchange, is what bucketing removes.
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("q138 discount band reaches the parquet scan as pushed filters") {
    val q = graft.SparkEntry.queries("q138_forecast_revenue")
    val df = q(spark, "/root/testdata/sf0.001")
    // plan.toString truncates the PushedFilters list — read the scan
    // node's metadata, which carries it in full (descending through the
    // AdaptiveSparkPlanExec leaf AQE wraps the plan in)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def findScan(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case f: FileSourceScanExec => Some(f)
      case other => other.children.view.flatMap(findScan(_)).headOption
    }
    val pushed = findScan(df.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in plan"))
      .metadata("PushedFilters")
    // the raw-column slack range is what makes the band row-group-
    // prunable; the exact round() band stays post-scan by construction
    assert(pushed.contains("GreaterThan(l_discount,0.0449)"),
      s"discount lower bound not pushed: $pushed")
    assert(pushed.contains("LessThan(l_discount,0.0751)"),
      s"discount upper bound not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24.0)"),
      s"quantity cap not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"),
      s"date window not pushed: $pushed")
    assert(df.collect().head.getLong(0) > 0L)
  }

  test("q276 footer-stats aggregate answers from parquet metadata, no data pages") {
    val q = graft.SparkEntry.queries("q276_parquet_footer_agg")
    val df = q(spark, "/root/testdata/sf0.001")
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      prevV1.split(",").map(_.trim)
        .filterNot(v => v == "parquet" || v.isEmpty).mkString(","))
    try {
      // rebuild the same aggregate to inspect its plan under the confs
      val agg = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.min("l_orderkey"),
          org.apache.spark.sql.functions.max("l_quantity"))
      assert(agg.collect().head.getLong(0) > 0L)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)") ||
        plan.contains("PushedAggregation: [MIN"),
        s"footer aggregate not pushed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
    // the gate itself returns footer-derived values (keys start at 0)
    val r = df.head()
    assert(r.getLong(0) > 0L && r.getLong(2) > r.getLong(1))
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate reaches the file index as a partition filter (no
    // data-file IO for other types) — the layout analog of bucketing
    assert(plan.contains("PartitionFilters:") && plan.contains("= click"),
      s"partition filter missing:\n$plan")
    assert(pruned.count() ===
      ev.filter(col("event_type") === "click").count())
  }

  test("q144 fact scan is pruned by a runtime dynamicpruning filter") {
    // The dim is an aggregate of the base table, so no static
    // constraint can reach the fact's partition column — if the scan
    // still shows a partition filter, it can only be DPP's runtime
    // subquery fed by the reused broadcast.
    val q = graft.SparkEntry.queries("q144_dynamic_pruning")
    val df = q(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // after AQE execution the tree's leaves are QueryStageExec wrappers
    // whose real subplans hang off `.plan`, not `children`
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val factScan = scans(df.queryExecution.executedPlan)
      .find(_.partitionFilters.nonEmpty)
      .getOrElse(fail("no partitioned scan in q144 plan"))
    assert(factScan.partitionFilters.mkString.contains("dynamicpruning"),
      s"no runtime pruning on the fact scan: ${factScan.partitionFilters}")
  }

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    import spark.implicits._
    // one hot key dwarfing the tail: the hot shuffle partition is both
    // > skewedPartitionThresholdInBytes and ≫ 5× the median, so AQE's
    // OptimizeSkewedJoin must split it into advisory-sized slices —
    // the runtime answer to skew the salted-agg/salted-join gates
    // (q57/q104) solve by rewrite
    // payload must be INCOMPRESSIBLE — a constant pad shrinks to
    // nothing in the compressed shuffle blocks and AQE sees no skew
    val hot = spark.range(20000).select(lit("hot").as("k"),
      expr("repeat(md5(cast(id as string)), 8)").as("payload"))
    val tail = spark.range(64L * 50).select(
      concat(lit("k"), (col("id") % 64).cast("string")).as("k"),
      expr("repeat(md5(cast(id + 1000000 as string)), 8)").as("payload"))
    val left = hot.unionAll(tail)
    val right = ("hot" +: (0 until 64).map(i => s"k$i")).toDF("rk")
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS df (count() would spawn its own QueryExecution and
      // leave joined's AQE plan un-finalized)
      assert(joined.collect().length === 20000 + 64 * 50)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"skewed partition not split by AQE:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the ROW-level companion to q144's partition-level DPP: a bloom
    // built from the filtered dim's join keys is pushed into the fact
    // scan, dropping rows before the shuffle. Thresholds here only
    // undo the 10 GB production default so the 6 MB fixture qualifies.
    val dir = "/root/testdata/sf0.001"
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = graft.Tables.lineitem(spark, dir)
      val urgent = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(joined.collect().length === 1)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
