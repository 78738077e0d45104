package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics and plan-shape guards for the SQL-surface gates
  * (q159–q161). The sf0.01 oracle proves the answers; these pin the
  * session-window tie rule on a crafted micro-corpus (the oracle's
  * random timestamps essentially never land exactly on the gap) and
  * the decorrelated plan shapes that make q160/q161 scale.
  */
class SurfaceGatesSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("session_window tie rule: exact-gap event MERGES; gap+1 splits") {
    import spark.implicits._
    // gap = 30 min. The event exactly `gap` after its predecessor
    // joins the session (inclusive merge — this pins the oracle's
    // strict `>` island test); one microsecond beyond splits.
    val t0 = 1700000000000000L
    val gap = 1800000000L
    val ev = Seq(
      (7L, t0),
      (7L, t0 + gap),         // exactly gap later → merges
      (7L, t0 + 2 * gap + 1)  // gap+1 after the second → new session
    ).toDF("user_id", "us").select(
      col("user_id"), timestamp_micros(col("us")).as("ts"))
    val out = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"),
        col("n"))
      .orderBy("s")
      .collect()
    assert(out.toSeq === Seq(
      Row(7L, t0, t0 + 2 * gap, 2L),
      Row(7L, t0 + 2 * gap + 1, t0 + 3 * gap + 1, 1L)))
  }

  test("q159 stream drain equals batch session_window on the same input") {
    // the gate's oracle is gaps-and-islands SQL; this asserts the
    // STREAMING path (watermark + sentinel flush) loses/duplicates no
    // session vs the batch operator on identical data.
    val streamed = graft.SparkEntry
      .queries("q159_session_window_stream")(spark, dir)
      .collect()
    val batch = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")
      .collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q160 spine zero-fills interior days on a crafted two-event corpus") {
    import spark.implicits._
    // two events 3 days apart → spine must carry days 1 and 2 with 0.
    val tmp = Files.createTempDirectory("q160spec").toString
    val t0 = 1700000000000000L
    // Tables.events expects the fixture encoding: INT64 nanoseconds
    // (read as LongType via nanosAsLong) — stage ts as nano longs.
    Seq((1L, t0, 1L), (2L, t0 + 3L * 86400000000L, 2L))
      .toDF("event_id", "us", "user_id")
      .select(col("event_id"), (col("us") * 1000L).as("ts"),
        col("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("q160_recursive_spine")(spark, tmp)
      .collect()
    assert(out.toSeq === Seq(
      Row(0L, 1L), Row(1L, 0L), Row(2L, 0L), Row(3L, 1L)))
  }

  test("q161 lateral top-k decorrelates to WindowGroupLimit, no re-execution") {
    val df = graft.SparkEntry.queries("q161_lateral_topk")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("WindowGroupLimit"),
      s"lateral LIMIT not decorrelated to a group-limit:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"lateral degenerated to a cartesian product:\n$plan")
    // per-group top-3 with |groups| bounded by nations → the join back
    // to nation must broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"nation join lost its broadcast:\n$plan")
    // ordering the lateral by the raw double used to regress this to a
    // GLOBAL range sort of the whole customer table before the window —
    // exactly one range partitioning may remain (the final ORDER BY)
    val rangeSorts = "rangepartitioning".r.findAllIn(plan).size
    assert(rangeSorts <= 1,
      s"customer table globally range-sorted before the group limit:\n$plan")
  }

  test("timer sessionizer: timer-closed session, then later events resume numbering") {
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    import graft.streaming.StreamingSessionsTws
    val tmp = Files.createTempDirectory("q163spec")
    val staging = Files.createDirectories(tmp.resolve("staging"))
    val t0 = 1700000000000000L
    val h = 3600000000L
    def mkFile(i: Int, rows: Seq[(Long, Long, Long)]): Unit = {
      val scratch = Files.createTempDirectory(tmp, s"s$i")
      rows.toDF("user_id", "us", "event_id")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("us").as("ts_us"), col("event_id"))
        .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val listing = Files.list(scratch)
      val src = try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      } finally listing.close()
      val dst = staging.resolve(f"$i%02d.parquet")
      Files.move(src, dst)
      Files.setLastModifiedTime(
        dst, FileTime.fromMillis(System.currentTimeMillis() - (9 - i) * 10000L))
    }
    // u1: two events 10 min apart (one session) — its timer fires once
    // the sentinel watermark passes; a LATER u1 event must open
    // session #2, not restart numbering at 1.
    mkFile(0, Seq((1L, t0, 1L), (1L, t0 + 600000000L, 2L)))
    mkFile(1, Seq((-1L, t0 + 3 * h, -1L)))
    mkFile(2, Seq((1L, t0 + 4 * h, 3L)))
    mkFile(3, Seq((-1L, t0 + 7 * h, -1L)))
    mkFile(4, Seq((-1L, t0 + 10 * h, -1L)))
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, ts_us BIGINT, event_id BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(staging.toString)
        .withWatermark("ts", "0 seconds")
        .as[StreamingSessionsTws.EvT]
      val q = StreamingSessionsTws.sessionizeWithTimers(stream)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .format("parquet").option("path", tmp.resolve("out").toString)
        .start()
      q.awaitTermination()
      val out = spark.read.parquet(tmp.resolve("out").toString)
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "session_idx")
        .collect()
      assert(out.toSeq === Seq(
        Row(1L, 1L, 2L, t0, t0 + 600000000L),
        Row(1L, 2L, 1L, t0 + 4 * h, t0 + 4 * h)))
    } finally prevProv match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("topk ListState digest merges across microbatches and prunes to k") {
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    import graft.streaming.StreamingTopK
    val tmp = Files.createTempDirectory("q166spec")
    val staging = Files.createDirectories(tmp.resolve("staging"))
    def mkFile(i: Int, rows: Seq[(Long, Long, Long)]): Unit = {
      val scratch = Files.createTempDirectory(tmp, s"s$i")
      rows.toDF("user_id", "v_e2", "event_id")
        .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val listing = Files.list(scratch)
      val src = try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      } finally listing.close()
      val dst = staging.resolve(f"$i%02d.parquet")
      Files.move(src, dst)
      Files.setLastModifiedTime(
        dst, FileTime.fromMillis(System.currentTimeMillis() - (9 - i) * 10000L))
    }
    // batch 1: u1 has 4 values → state prunes to top-3 {90,80,70};
    // batch 2: 85 displaces 70; a tie (85, lower id wins) checks the
    // deterministic order; sentinel flushes.
    mkFile(0, Seq((1L, 70L, 10L), (1L, 90L, 11L), (1L, 80L, 12L), (1L, 60L, 13L)))
    mkFile(1, Seq((1L, 85L, 24L), (1L, 85L, 20L), (1L, 0L, -1L)))
    val stream = spark.readStream
      .schema("user_id BIGINT, v_e2 BIGINT, event_id BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(staging.toString)
      .as[StreamingTopK.In]
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingTopK.topK(stream, k = 3)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .format("parquet").option("path", tmp.resolve("out").toString)
        .start()
      q.awaitTermination()
      val out = spark.read.parquet(tmp.resolve("out").toString)
        .orderBy("rank").collect()
      assert(out.toSeq === Seq(
        Row(1L, 1L, 90L, 11L),
        Row(1L, 2L, 85L, 20L),
        Row(1L, 3L, 85L, 24L)))
    } finally prevProv match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("q162 transformWithState sessionizer matches the legacy operator row for row") {
    // two engine generations of the same semantic must agree exactly
    // (both gates also share one oracle; this catches a divergence
    // without a DuckDB run).
    val tws = graft.SparkEntry.queries("q162_tws_sessionize")(spark, dir)
      .collect()
    val legacy = graft.SparkEntry.queries("q56_streaming_sessionize")(spark, dir)
      .collect()
    assert(tws.toSeq === legacy.toSeq)
  }
}
