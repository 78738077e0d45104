package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan auditor: prints the formatted physical plan of each query (or
  * the ones named in args) so scan counts, pushed filters, join
  * strategies, and WholeStageCodegen spans can be reviewed —
  * `sbt "runMain graft.tools.PlanAudit q21_minhash_lsh"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-plan-audit")
    val wanted = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted.isEmpty || wanted.contains(name) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"PLAN FAILED: $e") }
      }
    spark.stop()
  }
}
