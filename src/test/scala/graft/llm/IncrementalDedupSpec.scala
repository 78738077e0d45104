package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class IncrementalDedupSpec extends AnyFunSuite with SparkTestSession {

  private def keyed(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, i % 40)).toDF("row_id", "content_key")
  }

  test("newOnly equals the exact anti-join even through bloom false positives") {
    // fpp forced high (tiny sketch) so the maybe-path really exercises
    // the verify join; the output must STILL be exact.
    val corpus = keyed(0L until 25L) // keys 0..24
    val incoming = keyed(100L until 160L) // keys 0..39 cycling
    val got = IncrementalDedup.newOnly(
      incoming, corpus.select("content_key"), "content_key",
      expectedItems = 10L, fpp = 0.5)
      .select("row_id").collect().map(_.getLong(0)).sorted
    val want = incoming.join(corpus.select("content_key").distinct(),
      Seq("content_key"), "left_anti")
      .select("row_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("duplicates within the incoming batch are all kept") {
    import spark.implicits._
    val corpus = Seq(1L).toDF("content_key")
    val incoming = Seq((10L, 7L), (11L, 7L), (12L, 1L)).toDF("row_id", "content_key")
    val got = IncrementalDedup.newOnly(incoming, corpus, "content_key", 10L, 0.01)
      .select("row_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(10L, 11L)))
  }

  test("definitely-new rows take no shuffle: the bloom branch is a scan+filter") {
    // parquet-backed input so ConvertToLocalRelation can't fold the
    // bloom filter away at optimization time
    val tmp = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    keyed(200L until 260L).write.mode("overwrite").parquet(tmp)
    val incoming = spark.read.parquet(tmp)
    val corpus = keyed(0L until 10L)
    val plan = IncrementalDedup.newOnly(
      incoming, corpus.select("content_key"), "content_key", 100L, 0.01)
      .queryExecution.executedPlan.toString
    // the membership probe runs in-plan (codegen expression, not a UDF)...
    assert(plan.contains("might_contain"), plan)
    // ...and the union's bloom-rejected branch sits directly over the
    // file scan: the only Exchanges in the whole plan belong to the
    // residual anti-join's corpus side, never the incoming scan
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
