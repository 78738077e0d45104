package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeSourceSpec extends AnyFunSuite with SparkTestSession {

  private def read(start: Long, end: Long, slices: Int = 4) =
    spark.read.format("graft.sources.RangeSource")
      .option("start", start).option("end", end).option("slices", slices)
      .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    df.collect()
    df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
  }

  test("full read generates the exact interval") {
    val df = read(0, 1000)
    assert(df.count() === 1000L)
    val row = df.agg(sum("id"), sum("id_sq")).head()
    assert(row.getLong(0) === (0L until 1000L).sum)
    assert(row.getLong(1) === (0L until 1000L).map(i => i * i).sum)
  }

  test("id-range filters narrow the scan at planning time (no residual)") {
    val df = read(0, 100000).filter(col("id") >= 40000 && col("id") < 40100)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("[40000,40100)"),
      s"bounds not pushed: ${scan.scan.description()}")
    // fully-pushed filters leave no post-scan Filter on id
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter "),
      s"pushed filter reappeared post-scan:\n$plan")
    assert(df.count() === 100L)
  }

  test("column pruning reaches the reader's output schema") {
    val df = read(0, 100).select("label")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("label"))
    assert(df.distinct().count() === 16L)
  }

  test("slice planning covers the interval exactly, any slice count") {
    for (slices <- Seq(1, 3, 8, 64)) {
      val df = read(100, 1123, slices)
      assert(df.count() === 1023L, s"slices=$slices")
      assert(df.agg(sum("id")).head().getLong(0) ===
        (100L until 1123L).sum, s"slices=$slices")
    }
  }

  test("negative interval keeps bucket in [0,16) and empty range is empty") {
    val df = read(-33, 0)
    val b = df.agg(min("bucket"), max("bucket")).head()
    assert(b.getLong(0) >= 0L && b.getLong(1) <= 15L)
    assert(read(5, 5).count() === 0L)
  }

  test("equality pushdown collapses to a one-row scan") {
    val df = read(0, 1000000).filter(col("id") === 777L)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("[777,778)"),
      s"equality not collapsed: ${scan.scan.description()}")
    assert(df.select("id_sq").head().getLong(0) === 777L * 777L)
  }

  private def readStreamRange(end: Long, maxRows: Long) =
    spark.readStream.format("graft.sources.RangeSource")
      .option("start", 0).option("end", end).option("slices", 3)
      .option("maxRowsPerBatch", maxRows)
      .load()

  test("streaming read drains the interval in admission-bounded micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rs-stream")
    val out = dir.resolve("out").toString
    val cp = dir.resolve("cp").toString
    val q = readStreamRange(end = 10000, maxRows = 1024)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() === 10000L)
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 10000L).sum)
    // the 1024-row admission cap split the drain into many planned
    // batches (ceil(10000/1024) = 10), visible in the offset log
    val offsets = new java.io.File(cp, "offsets").list()
    assert(offsets.length >= 5, s"expected multi-batch drain: ${offsets.length}")
  }

  test("checkpoint restart extends the interval exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rs-restart")
    val out = dir.resolve("out").toString
    val cp = dir.resolve("cp").toString
    def drain(end: Long): Unit = {
      val q = readStreamRange(end, maxRows = 2048)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      q.awaitTermination()
    }
    drain(end = 5000)
    assert(spark.read.parquet(out).count() === 5000L)
    // restart from the SAME checkpoint with a longer interval: only the
    // delta [5000, 12000) is revealed — committed offsets replay nothing
    drain(end = 12000)
    val got = spark.read.parquet(out)
    assert(got.count() === 12000L)
    assert(got.select("id").distinct().count() === 12000L,
      "restart re-delivered committed ids")
    assert(got.agg(sum("id")).head().getLong(0) === (0L until 12000L).sum)
  }
}
