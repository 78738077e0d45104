package graft.tools

import org.apache.spark.sql.functions._

/** Scratch per-component attribution for the q11/q12/q309 residual
  * (guide §1.2 step 2): times each layer of the ETL transform stack
  * through the noop sink — fixture build alone, +parse_json,
  * +variant extraction, full transform without the final sort, full
  * gate — so the expression-cost hypothesis can be confirmed or
  * killed before touching codegen. Bench-protocol timing (warmup +
  * median-of-3) per variant, one JVM.
  */
object EtlCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("etl-cost-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      graft.CacheScope.scoped {
        def onePass(): Double = {
          val t0 = System.nanoTime()
          mk.write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val jb = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
        onePass()
        val passes = Seq(onePass(), onePass(), onePass()).sorted
        val jobs = (spark.sparkContext.statusTracker
          .getJobIdsForGroup(null).length - jb) / 4
        println(f"[etlprobe] $name%-28s ${passes(1)}%6.3f s  (min ${passes.head}%6.3f)  ~$jobs jobs/pass")
      }

    import graft.queries.EtlQueries._
    import graft.etl._

    time("orders_scan") { graft.Tables.orders(spark, dir) }
    time("orders_repart_rr") {
      graft.Tables.orders(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
    }
    time("orders_repart_hash") {
      val o = graft.Tables.orders(spark, dir)
      o.repartition(spark.sparkContext.defaultParallelism, xxhash64(col("o_orderkey")))
    }
    time("fixture_only") { rawOrdersDocs(spark, dir) }
    time("fixture_parsejson") {
      rawOrdersDocs(spark, dir).select(parse_json(col("raw")).cast("string").as("v"))
    }
    time("transform_nosort") {
      Transform.transformFlat(
        rawOrdersDocs(spark, dir), "raw", ordersMapping,
        EtlDefaults.runtime, EtlDefaults.audit)
        .withColumn("amount", col("amount").cast("double"))
        .withColumn("amount2", col("amount2").cast("double"))
    }
    time("q11_full") {
      graft.SparkEntry.queries("q11_etl_transform")(spark, dir)
    }
    time("q12_full") {
      graft.SparkEntry.queries("q12_schema_inference")(spark, dir)
    }
    time("q12_nosort_novote") {
      val raw = rawOrdersDocs(spark, dir)
      raw.select(explode(parse_json(col("raw")).try_cast("map<string,variant>"))
        .as(Seq("attribute", "vv")))
        .select(col("attribute"), col("vv").try_cast("string").as("s"))
    }
    spark.stop()
  }
}
