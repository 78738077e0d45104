package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ChecksumSinkSpec extends AnyFunSuite with SparkTestSession {

  test("commit publishes the merged digest across partitions") {
    import spark.implicits._
    ChecksumSink.clear("t1")
    val vals = (1L to 10000L)
    vals.toDF("v").repartition(7)
      .write.format("graft.sources.ChecksumSink")
      .option("tag", "t1").mode("append").save()
    val d = ChecksumSink.result("t1").getOrElse(fail("nothing committed"))
    assert(d.rows === 10000L)
    assert(d.sum === vals.sum)
    assert(d.xor === vals.reduce(_ ^ _))
  }

  test("a failing job publishes NOTHING (abort path)") {
    import spark.implicits._
    ChecksumSink.clear("t2")
    val boom = udf { v: Long =>
      if (v == 5000L) throw new RuntimeException("planted failure"); v
    }
    intercept[Exception] {
      (1L to 10000L).toDF("v").repartition(4)
        .select(boom(col("v")).as("v"))
        .write.format("graft.sources.ChecksumSink")
        .option("tag", "t2").mode("append").save()
    }
    assert(ChecksumSink.result("t2").isEmpty,
      "aborted job leaked a committed digest")
  }

  test("rejects a write that is not one BIGINT column at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "v")
        .write.format("graft.sources.ChecksumSink")
        .option("tag", "t3").mode("append").save()
    }
    // Spark's output resolution enforces the declared 1-column schema
    assert(e.getMessage.toLowerCase.contains("too many data columns"))
  }

  test("task abort mid-write leaves no partial state; the retry attempt wins") {
    // Drive the DSV2 commit protocol directly (local-mode task retry
    // can't be provoked under the suite's shared local[4] master):
    // attempt 0 of partition 0 writes half its rows and ABORTS;
    // attempt 1 rewrites the full partition and commits. The driver
    // must see ONLY the surviving attempts' partials — the aborted
    // writer's rows must be unreachable by construction, because a
    // partial is speculative until its commit message is handed to
    // BatchWrite.commit.
    import org.apache.spark.sql.catalyst.InternalRow
    ChecksumSink.clear("t5")
    val batch = new ChecksumBatchWrite("t5")
    val factory = batch.createBatchWriterFactory(null)

    val failed = factory.createWriter(0, 0L)
    (1L to 500L).foreach(v => failed.write(InternalRow(v)))
    failed.abort() // mid-write failure: message never produced
    failed.close()

    val retry = factory.createWriter(0, 1L)
    (1L to 1000L).foreach(v => retry.write(InternalRow(v)))
    val m0 = retry.commit()

    val other = factory.createWriter(1, 2L)
    (1001L to 2000L).foreach(v => other.write(InternalRow(v)))
    val m1 = other.commit()

    batch.commit(Array(m0, m1))
    val d = ChecksumSink.result("t5").getOrElse(fail("nothing committed"))
    assert(d.rows === 2000L, "aborted attempt's rows leaked into the digest")
    assert(d.sum === (1L to 2000L).sum)
    assert(d.xor === (1L to 2000L).reduce(_ ^ _))
  }

  test("driver abort after some tasks committed still publishes nothing") {
    // Tasks can SUCCEED and the job still die (another task exhausted
    // retries): their commit messages reach BatchWrite.abort, which
    // must drop them.
    import org.apache.spark.sql.catalyst.InternalRow
    ChecksumSink.clear("t6")
    val batch = new ChecksumBatchWrite("t6")
    val factory = batch.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 0L)
    (1L to 100L).foreach(v => w.write(InternalRow(v)))
    val m = w.commit()
    batch.abort(Array(m))
    assert(ChecksumSink.result("t6").isEmpty,
      "job abort published a digest from completed task partials")
  }

  test("read-then-write roundtrip: RangeSource digest matches closed form") {
    ChecksumSink.clear("t4")
    spark.read.format("graft.sources.RangeSource")
      .option("start", 0).option("end", 100000).option("slices", 8)
      .load()
      .filter(col("id") < 1000)
      .select(col("id").as("v")) // the sink resolves by name
      .write.format("graft.sources.ChecksumSink")
      .option("tag", "t4").mode("append").save()
    val d = ChecksumSink.result("t4").getOrElse(fail("nothing committed"))
    assert(d.rows === 1000L)
    assert(d.sum === (0L until 1000L).sum)
  }

  test("RequiresDistributionAndOrdering: the engine clusters and sorts for the sink") {
    import spark.implicits._
    ChecksumSink.clear("t-clustered")
    // deliberately unsorted, key-interleaved input across partitions:
    // the SINK's declared distribution/ordering must fix the layout
    val vals = (1L to 8000L).map(v => (v % 32, v))
    spark.sparkContext.parallelize(scala.util.Random.javaRandomToRandom(
      new java.util.Random(42)).shuffle(vals), 9)
      .toDF("k", "v")
      .write.format("graft.sources.ChecksumSink")
      .option("tag", "t-clustered").option("clusterByK", "true")
      .mode("append").save()
    // the writer THROWS on any ordering violation and the driver-side
    // commit re-checks key disjointness, so a published digest IS the
    // proof the engine satisfied the contract
    val d = ChecksumSink.result("t-clustered")
      .getOrElse(fail("nothing committed"))
    assert(d.rows === 8000L)
    assert(d.sum === (1L to 8000L).sum)
    assert(d.xor === (1L to 8000L).reduce(_ ^ _))
  }

  test("clusterByK honors an exact requiredNumPartitions") {
    import spark.implicits._
    ChecksumSink.clear("t-parts")
    (1L to 1000L).map(v => (v % 8, v)).toDF("k", "v")
      .repartition(13)
      .write.format("graft.sources.ChecksumSink")
      .option("tag", "t-parts").option("clusterByK", "true")
      .option("numPartitions", "3")
      .mode("append").save()
    val d = ChecksumSink.result("t-parts").getOrElse(fail("nothing committed"))
    assert(d.rows === 1000L)
  }

  test("streaming epoch commit is replay-idempotent and cumulative") {
    val w = new ChecksumStreamingWrite("t-stream-unit")
    ChecksumSink.clear("t-stream-unit")
    w.commit(0L, Array(ChecksumPartial(10, 100, 7)))
    w.commit(1L, Array(ChecksumPartial(5, 50, 3)))
    assert(ChecksumSink.result("t-stream-unit").get ===
      ChecksumSink.Digest(15, 150, 7 ^ 3))
    // a REPLAYED epoch replaces its slot - no double counting
    w.commit(1L, Array(ChecksumPartial(5, 50, 3)))
    assert(ChecksumSink.result("t-stream-unit").get ===
      ChecksumSink.Digest(15, 150, 7 ^ 3))
    // a corrected replay (retried batch produced the same logical rows
    // split differently across tasks) still lands once
    w.commit(1L, Array(ChecksumPartial(2, 20, 1), ChecksumPartial(3, 30, 2)))
    assert(ChecksumSink.result("t-stream-unit").get ===
      ChecksumSink.Digest(15, 150, 7 ^ 3))
    // a replay of a LONG-committed epoch (older than the last) is a
    // no-op: its deterministic digest is already folded in
    w.commit(0L, Array(ChecksumPartial(10, 100, 7)))
    assert(ChecksumSink.result("t-stream-unit").get ===
      ChecksumSink.Digest(15, 150, 7 ^ 3))
    // and the state is O(1) per tag — commits keep advancing correctly
    // long after any per-epoch ledger would have grown unbounded
    (2L to 101L).foreach(e => w.commit(e, Array(ChecksumPartial(1, e, 0))))
    assert(ChecksumSink.result("t-stream-unit").get ===
      ChecksumSink.Digest(115, 150 + (2L to 101L).sum, 7 ^ 3))
  }

  test("older-epoch replay with a DIFFERENT digest is detected, not silently absorbed") {
    // The determinism precondition: an epoch < last replay is ignored
    // because its digest is assumed already folded in. When that
    // assumption breaks (non-deterministic source, partitioning change
    // across a restart), the stale cumulative cannot self-correct —
    // the sink must at least surface the violation.
    val w = new ChecksumStreamingWrite("t-stream-mm")
    ChecksumSink.clear("t-stream-mm")
    w.commit(0L, Array(ChecksumPartial(10, 100, 7)))
    w.commit(1L, Array(ChecksumPartial(5, 50, 3)))
    w.commit(2L, Array(ChecksumPartial(1, 10, 1)))
    assert(ChecksumSink.replayMismatches("t-stream-mm") === 0L)
    // same-digest replay of a long-committed epoch: verified clean
    w.commit(0L, Array(ChecksumPartial(10, 100, 7)))
    assert(ChecksumSink.replayMismatches("t-stream-mm") === 0L)
    // DIFFERENT digest for epoch 0 — counted; cumulative unchanged
    // (there is nothing sound to do with it, that's the point)
    w.commit(0L, Array(ChecksumPartial(11, 101, 7)))
    assert(ChecksumSink.replayMismatches("t-stream-mm") === 1L)
    assert(ChecksumSink.result("t-stream-mm").get ===
      ChecksumSink.Digest(16, 160, 7 ^ 3 ^ 1))
    // split-differently-but-equal replay still verifies clean
    w.commit(1L, Array(ChecksumPartial(2, 20, 1), ChecksumPartial(3, 30, 2)))
    assert(ChecksumSink.replayMismatches("t-stream-mm") === 1L)
    ChecksumSink.clear("t-stream-mm")
    assert(ChecksumSink.replayMismatches("t-stream-mm") === 0L)
  }

  test("streaming drain through the sink digests every micro-batch exactly once") {
    import spark.implicits._
    ChecksumSink.clear("t-stream-e2e")
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-stream")
    (1L to 5000L).toDF("v").repartition(3)
      .write.parquet(dir.resolve("staging").toString)
    val q = spark.readStream.schema("v BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.resolve("staging").toString)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", dir.resolve("cp").toString)
      .format("graft.sources.ChecksumSink")
      .option("tag", "t-stream-e2e")
      .start()
    q.awaitTermination()
    val d = ChecksumSink.result("t-stream-e2e").getOrElse(fail("nothing"))
    assert(d.rows === 5000L)
    assert(d.sum === (1L to 5000L).sum)
    assert(d.xor === (1L to 5000L).reduce(_ ^ _))
  }
}
