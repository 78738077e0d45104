package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.etl._
import graft.queries.EtlQueries

/** Throwaway micro-experiment (not library surface): does the q304
  * split-bound lesson generalize to the transform-family gates?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.get("graft-scratch")

    val raw = EtlQueries.rawOrdersDocs(s, dir)
    println(s"[scratch] rawOrdersDocs partitions = ${raw.rdd.getNumPartitions}")
    println(s"[scratch] defaultParallelism = ${s.sparkContext.defaultParallelism}")

    def time(name: String, df: => DataFrame): Unit = {
      val d = df
      d.write.mode("overwrite").format("noop").save() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        d.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[scratch] $name%-28s median=${ts(1)}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    def flat(input: DataFrame) =
      Transform.transformFlat(input, "raw", EtlQueries.ordersMapping,
        EtlDefaults.runtime, EtlDefaults.audit)
        .withColumn("amount", col("amount").cast("double"))
        .withColumn("amount2", col("amount2").cast("double"))
        .orderBy("order_id")

    time("q11 as-is", flat(raw))
    time("q11 repart32", flat(raw.repartition(32)))

    time("q12 as-is", SchemaInference.inferSchema(raw, "raw"))
    time("q12 repart32", SchemaInference.inferSchema(raw.repartition(32), "raw"))

    val orders = Tables.orders(s, dir)
    println(s"[scratch] orders partitions = ${orders.rdd.getNumPartitions}")
    s.stop()
  }
}
