package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.llm.TextHash

class RewriteMd5PrefixChainSpec extends AnyFunSuite with SparkTestSession {

  test("the portable hash chain optimizes to the native expression, same results") {
    // parquet-backed so constant folding can't collapse the projection
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").as("s"), TextHash.hash60(col("text")).as("h"))
      .limit(200)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("md5_prefix60"), s"rule did not fire:\n$optimized")
    assert(!optimized.toLowerCase.contains("conv("), s"chain survived:\n$optimized")
    // results identical to the JVM reference hash
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) == TextHash.jvmHash60(r.getString(0))))
  }

  test("other md5/conv shapes are left untouched") {
    import spark.implicits._
    val df = Seq("x").toDF("s").select(
      conv(substring(md5(col("s")), 1, 14), 16, 10).as("other"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("md5_prefix60"))
    assert(df.head().getString(0).nonEmpty)
  }
}
