package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.llm.Similarity

class RewriteLongDotChainSpec extends AnyFunSuite with SparkTestSession {

  test("the portable dot chain optimizes to the native expression, same results") {
    // parquet-backed so constant folding can't collapse the projection
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(Similarity.quantize(col("embedding")).as("q"))
      .select(col("q"), Similarity.intDot(col("q"), col("q")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("long_dot"), s"rule did not fire:\n$optimized")
    assert(!optimized.contains("zip_with"), s"chain survived:\n$optimized")
    // results identical to a JVM-side reference dot
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val q = r.getSeq[Long](0)
      r.getLong(1) == q.map(x => x * x).sum
    })
  }

  test("native and composed agree on nulls, length mismatch, and empty") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),   // 11
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)), // null elem
      (Seq[java.lang.Long](1L, 2L, 5L), Seq[java.lang.Long](3L)),   // mismatch
      (Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]))       // 0
      .toDF("a", "b")
    val out = df.select(
      Similarity.intDot(col("a"), col("b")).as("composed"),
      call_function("long_dot", col("a"), col("b")).as("native"))
      .collect()
    assert(out.forall(r => r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1))))
    assert(out(0).getLong(1) == 11L && out(3).getLong(1) == 0L)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("other aggregate/zip_with shapes are left untouched") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b").select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0L), (acc, x) => acc + x).as("sumzip"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("long_dot"))
    assert(df.head().getLong(0) == 10L)
  }
}
