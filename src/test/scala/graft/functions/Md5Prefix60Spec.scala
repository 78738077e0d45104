package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.llm.TextHash

class Md5Prefix60Spec extends AnyFunSuite with SparkTestSession {

  test("native expression equals the composed chain and the JVM hash") {
    import spark.implicits._
    val strs = (0 until 5000).map(i => s"probe string $i with content ${i * 37}")
    val df = strs.toDF("s").select(
      col("s"),
      TextHash.hash60(col("s")).as("chain"),
      call_function("md5_prefix60", col("s")).as("native"))
    assert(df.filter(col("chain") =!= col("native")).count() == 0)
    val one = df.head()
    assert(one.getLong(2) == TextHash.jvmHash60(one.getString(0)))
  }

  test("SQL-registered, null-safe, rejects non-strings, codegen-compatible") {
    assert(spark.sql("SELECT md5_prefix60('abc')").head().getLong(0) ==
      TextHash.jvmHash60("abc"))
    assert(spark.sql("SELECT md5_prefix60(CAST(NULL AS STRING))").head().isNullAt(0))
    assertThrows[Exception](spark.sql("SELECT md5_prefix60(42)").collect())
    // runs inside whole-stage codegen over a real scan
    import spark.implicits._
    val n = (0 until 1000).map(_.toString).toDF("s")
      .selectExpr("md5_prefix60(s) AS h").filter(col("h") >= 0).count()
    assert(n == 1000)
  }
}
