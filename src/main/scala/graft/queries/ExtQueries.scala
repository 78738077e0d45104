package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.llm.Multimodal
import graft.streaming.{StreamingEtl, StreamingUpsert}

/** Gate queries for the two components that were spec-only in round 3
  * (r03 verdict stretch item): the streaming dedup path and the
  * multimodal binary plumbing. Both are made oracle-checkable by
  * deriving deterministic inputs from the fixture tables and emitting
  * outputs DuckDB can recompute from the same base columns.
  */
object ExtQueries {

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(f => Files.deleteIfExists(f))
    }

  private val exitReaper = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  sys.addShutdownHook(exitReaper.forEach(p =>
    try deleteRecursively(p) catch { case _: Throwable => () }))

  private def deleteOnExit(p: java.nio.file.Path): Unit = exitReaper.add(p)

  /** Run `start` with the session's shuffle-partition count scoped to
    * `n`: streaming state lives in one store per shuffle partition and
    * every microbatch snapshots each store to the checkpoint, so at
    * gate volume the 32-partition batch default is pure fixed overhead
    * (measured 6.5 s → 3.2 s on the stream-join gate). The conf is
    * read when the stream STARTS, so the override scopes to the call;
    * production sizes state partitions to keys ÷ target-state-per-
    * store, independently of the batch shuffle setting.
    */
  private def withStatePartitions[A](
      s: org.apache.spark.sql.SparkSession, n: Int)(start: => A): A =
    SqlConfScope.withShufflePartitions(s, n)(start)

  val specs: Map[String, QuerySpec] = Map(

    // Q32: streaming exact dedup, end to end through a REAL stream —
    // stage documents plus re-deliveries (every 7th doc re-sent 1s
    // later) as parquet, drain readStream → dropDuplicatesWithinWatermark
    // → parquet sink with Trigger.AvailableNow, read the sink back. If
    // dedup drops nothing the re-delivered ids appear twice and the row
    // count goes red. Output is doc_id only, so WHICH delivery survives
    // (batch-order dependent) can't perturb the hash.
    "q32_streaming_dedup" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q32")
        val tmp = tmpPath.toString
        val docs = Tables.documents(s, dir).select(
          col("doc_id"),
          timestamp_seconds(lit(1767225600L) + pmod(col("doc_id"), lit(3600)))
            .as("ts"))
        val staged = docs.unionByName(
          docs.filter(pmod(col("doc_id"), lit(7)) === 0)
            .withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND")))
        // One staged file ⇒ AvailableNow processes everything in a single
        // microbatch regardless of maxFilesPerTrigger/file ordering — a
        // multi-batch split could advance the watermark past originals
        // staged behind it and drop them as late rows (round-4 advice).
        staged.coalesce(1).write.parquet(s"$tmp/staging")
        val stream = s.readStream.schema(staged.schema).parquet(s"$tmp/staging")
        val q = withStatePartitions(s, 4) {
          StreamingEtl.dedupStream(stream, "doc_id", "ts", "1 hour")
            .select("doc_id")
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$tmp/checkpoint")
            .format("parquet")
            .option("path", s"$tmp/out")
            .start()
        }
        q.awaitTermination()
        // The drained stream never reads staging/checkpoint again —
        // drop them now; `out` must outlive the returned (lazy) frame,
        // so the whole tempdir is reaped at JVM exit instead of leaking
        // across warmup+timed bench passes (round-4 advice).
        deleteRecursively(tmpPath.resolve("staging"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        s.read.parquet(s"$tmp/out").orderBy("doc_id")
      },
      "SELECT doc_id FROM documents ORDER BY doc_id"),

    // Q43: watermarked tumbling-window aggregation, end to end through a
    // REAL stream (the `windowedCounts` operator was spec-only before).
    // Append mode only emits a window once the watermark passes its end,
    // so the stage appends one sentinel event 3 h past the real maximum:
    // the final AvailableNow batch advances the watermark beyond every
    // real window (the sentinel's own window never closes and is the one
    // row the filter drops). Epoch-seconds output keeps the comparator
    // off timestamp-precision differences.
    "q43_streaming_window" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val tmpPath = GateTmp.dir("graft-q43")
        val tmp = tmpPath.toString
        val ev = Tables.events(s, dir).select(col("ts"), col("event_type"))
        val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
        val sentinel = new java.sql.Timestamp(maxTs.getTime + 3L * 3600 * 1000)
        val staged = ev.unionByName(
          Seq((sentinel, "__flush")).toDF("ts", "event_type"))
        staged.coalesce(1).write.parquet(s"$tmp/staging")
        val stream = s.readStream.schema(staged.schema).parquet(s"$tmp/staging")
        val q = withStatePartitions(s, 4) {
          StreamingEtl.windowedCounts(
            stream, "ts", "event_type", windowLength = "1 hour", watermark = "1 hour")
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$tmp/checkpoint")
            .format("parquet")
            .option("path", s"$tmp/out")
            .start()
        }
        q.awaitTermination()
        deleteRecursively(tmpPath.resolve("staging"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        s.read.parquet(s"$tmp/out")
          .filter(col("event_type") =!= "__flush")
          .select(
            unix_timestamp(col("window_start")).cast("bigint").as("window_start_epoch"),
            col("event_type"), col("cnt"))
          .orderBy("window_start_epoch", "event_type")
      },
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
                event_type, count(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q44: gap-based sessionization over the events table — both
    // windows partitioned by user (per-key state = one row; the only
    // shuffle is the user_id hash partition). Epoch-microsecond longs
    // keep the gap predicate engine-exact.
    "q44_sessionize" -> QuerySpec(
      (s, dir) =>
        graft.analytics.EventSessions.sessionize(
          Tables.events(s, dir), col("user_id"), col("ts"), col("event_id"))
          .orderBy("user_id", "session_idx"),
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         f AS (SELECT user_id, ts_us, event_id,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         g AS (SELECT user_id, ts_us,
                 CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                      AS BIGINT) AS session_idx
               FROM f)
         SELECT user_id, session_idx, count(*) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us
         FROM g GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q56: streaming sessionization through a REAL stream — the
    // flatMapGroupsWithState operator with one open-session struct per
    // user. A per-user sentinel event 3h past the global max closes
    // every real session in the final batch (the sentinel's own session
    // stays in state and is never emitted), so the drained output equals
    // the batch sessionization — the oracle is q44's SQL verbatim.
    "q56_streaming_sessionize" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val tmpPath = GateTmp.dir("graft-q56")
        val tmp = tmpPath.toString
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
        val flushUs = ev.agg(max("ts_us")).head().getLong(0) + 3L * 3600 * 1000000
        val staged = ev.unionByName(
          ev.select(col("user_id")).distinct()
            .select(col("user_id"), lit(flushUs).as("ts_us"),
              lit(-1L).as("event_id")))
        staged.coalesce(1).write.parquet(s"$tmp/staging")
        val stream = s.readStream.schema(staged.schema).parquet(s"$tmp/staging")
          .as[graft.streaming.StreamingSessions.Ev]
        val q = withStatePartitions(s, 4) {
          graft.streaming.StreamingSessions.sessionize(stream)
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$tmp/checkpoint")
            .format("parquet")
            .option("path", s"$tmp/out")
            .start()
        }
        q.awaitTermination()
        deleteRecursively(tmpPath.resolve("staging"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        s.read.parquet(s"$tmp/out").orderBy("user_id", "session_idx")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         f AS (SELECT user_id, ts_us, event_id,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         g AS (SELECT user_id, ts_us,
                 CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                      AS BIGINT) AS session_idx
               FROM f)
         SELECT user_id, session_idx, count(*) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us
         FROM g GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q85: stream-stream interval join through a REAL stream — clicks
    // attributed to the purchases they preceded by ≤ 6 h, per user,
    // via two watermarked file streams and an event-time-bounded inner
    // join (the state-cleanup contract Spark requires). Each side is
    // staged as ONE file so AvailableNow sees both sides in the first
    // microbatch; the 40-day watermark spans the whole fixture so no
    // state is evicted mid-drain (real deployments size it to the
    // lateness bound). The oracle is the equivalent batch interval
    // join.
    "q85_streaming_join" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q85")
        val tmp = tmpPath.toString
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click").select(
          col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase").select(
          col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
        clicks.coalesce(1).write.parquet(s"$tmp/clicks")
        purchases.coalesce(1).write.parquet(s"$tmp/purchases")
        val cs = s.readStream.schema(clicks.schema).parquet(s"$tmp/clicks")
        val ps = s.readStream.schema(purchases.schema).parquet(s"$tmp/purchases")
        val joined = graft.streaming.StreamJoin.intervalJoin(
          cs, ps, "c_user", "p_user", "c_ts", "p_ts",
          lookback = "6 HOURS", watermark = "40 DAYS")
          .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("delta_us"))
        val q = withStatePartitions(s, 4) {
          joined.writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$tmp/checkpoint")
            .format("parquet")
            .option("path", s"$tmp/out")
            .start()
        }
        q.awaitTermination()
        deleteRecursively(tmpPath.resolve("clicks"))
        deleteRecursively(tmpPath.resolve("purchases"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        s.read.parquet(s"$tmp/out").orderBy("click_id", "purchase_id")
      },
      """WITH c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS purchase_id
               FROM events WHERE event_type = 'purchase')
         SELECT c.user_id, c.click_id, p.purchase_id, p.p_us - c.c_us AS delta_us
         FROM c JOIN p ON c.user_id = p.user_id
                      AND c.c_us >= p.p_us - 21600000000
                      AND c.c_us <= p.p_us
         ORDER BY click_id, purchase_id"""),

    // Q146: stream-stream LEFT OUTER interval join — the state-
    // EVICTION semantics q85's inner join never exercises. An
    // unmatched click emits null-extended only when the global
    // watermark (min over both inputs of max event time − 2 days)
    // passes the last instant a purchase could still match it
    // (click ts + 6 h); newer unmatched clicks stay in state and are
    // correctly ABSENT from the sink. The oracle encodes exactly that:
    // batch inner join ∪ unmatched clicks with c_us + 6h < watermark.
    // At 100 TB this is the always-on attribution pipeline: state
    // stays watermark-bounded and every click is eventually accounted
    // for, matched or expired.
    "q146_streaming_outer_join" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q146")
        val tmp = tmpPath.toString
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click").select(
          col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase").select(
          col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
        clicks.coalesce(1).write.parquet(s"$tmp/clicks")
        purchases.coalesce(1).write.parquet(s"$tmp/purchases")
        val cs = s.readStream.schema(clicks.schema).parquet(s"$tmp/clicks")
        val ps = s.readStream.schema(purchases.schema).parquet(s"$tmp/purchases")
        val joined = graft.streaming.StreamJoin.intervalJoin(
          cs, ps, "c_user", "p_user", "c_ts", "p_ts",
          lookback = "6 HOURS", watermark = "2 DAYS", joinType = "leftOuter")
          .select(col("c_user").as("user_id"), col("click_id"),
            col("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("delta_us"))
        val q = withStatePartitions(s, 4) {
          joined.writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$tmp/checkpoint")
            .format("parquet")
            .option("path", s"$tmp/out")
            .start()
        }
        q.awaitTermination()
        deleteRecursively(tmpPath.resolve("clicks"))
        deleteRecursively(tmpPath.resolve("purchases"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        s.read.parquet(s"$tmp/out").orderBy("click_id", "purchase_id")
      },
      """WITH c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS purchase_id
               FROM events WHERE event_type = 'purchase'),
         w AS (SELECT least((SELECT max(c_us) FROM c), (SELECT max(p_us) FROM p))
                      - 172800000000 AS wm),
         m AS (SELECT c.user_id, c.click_id, p.purchase_id,
                      p.p_us - c.c_us AS delta_us
               FROM c JOIN p ON c.user_id = p.user_id
                            AND c.c_us >= p.p_us - 21600000000
                            AND c.c_us <= p.p_us)
         SELECT user_id, click_id, purchase_id, delta_us FROM m
         UNION ALL
         SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id,
                CAST(NULL AS BIGINT) AS delta_us
         FROM c CROSS JOIN w
         WHERE c.click_id NOT IN (SELECT click_id FROM m)
           AND c.c_us + 21600000000 < w.wm
         ORDER BY click_id, purchase_id"""),

    // Q33: multimodal binary plumbing without codecs — synthesize each
    // asset's payload as a StubCodec header from doc_id arithmetic
    // (every 13th doc gets undecodable bytes), push it through resize
    // (binary-in/binary-out, maxDim 32) then the partition-batched
    // decode. The oracle recomputes the header ints and the resize
    // arithmetic (same double ops: scale = 32/max(w,h), trunc) straight
    // from doc_id.
    "q33_multimodal_decode" -> QuerySpec(
      (s, dir) => {
        val mkPayload = udf { id: Long =>
          if (id % 13 == 0) Array[Byte](1, 2, 3)
          else Multimodal.StubCodec.encodeHeader(
            (16 + id % 64).toInt, (16 + (id * 3) % 64).toInt, (1 + id % 10).toInt)
        }
        val assets = Tables.documents(s, dir).select(
          col("doc_id").as("asset_id"),
          mkPayload(col("doc_id")).as("payload"),
          lit("image/x-graft").as("mime"),
          concat(lit("mem://assets/"), col("doc_id")).as("uri"))
        Multimodal.decodeAssets(Multimodal.resize(assets, maxDim = 32))
          .orderBy("asset_id")
      },
      """WITH hdr AS (
           SELECT doc_id AS asset_id,
                  CASE WHEN doc_id%13=0 THEN NULL ELSE 16 + doc_id%64 END AS w0,
                  CASE WHEN doc_id%13=0 THEN NULL ELSE 16 + (doc_id*3)%64 END AS h0,
                  CASE WHEN doc_id%13=0 THEN NULL ELSE 1 + doc_id%10 END AS f0
           FROM documents),
         scaled AS (
           SELECT asset_id, w0, h0, f0,
                  CASE WHEN w0 IS NULL THEN NULL
                       WHEN greatest(w0, h0) <= 32 THEN 1.0
                       ELSE 32.0 / greatest(w0, h0) END AS scale
           FROM hdr)
         SELECT asset_id,
                CASE WHEN w0 IS NULL THEN NULL
                     ELSE CAST(greatest(1, trunc(w0 * scale)) AS INTEGER) END AS width,
                CASE WHEN h0 IS NULL THEN NULL
                     ELSE CAST(greatest(1, trunc(h0 * scale)) AS INTEGER) END AS height,
                CAST(f0 AS INTEGER) AS n_frames,
                (w0 IS NOT NULL) AS decode_ok
         FROM scaled ORDER BY asset_id"""),

    // Q130: stream-static enrichment — the standard "join the stream
    // against a slowly-changing dimension" shape: events drain through
    // a REAL readStream and each row picks up its customer's market
    // segment via a stream-static BROADCAST join (stateless, append
    // mode, no watermark: the static side is re-planned per microbatch,
    // never held in stream state). The oracle is the plain batch join.
    "q130_stream_static_enrich" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q130")
        val tmp = tmpPath.toString
        val ev = Tables.events(s, dir).select(
          col("event_id"), col("user_id"),
          round(col("value") * 100).cast("long").as("v_e2"))
        ev.coalesce(1).write.parquet(s"$tmp/staging")
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        val stream = s.readStream.schema(ev.schema).parquet(s"$tmp/staging")
        val q = stream
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"),
            col("c_mktsegment").as("segment"), col("v_e2"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/checkpoint")
          .format("parquet")
          .option("path", s"$tmp/out")
          .start()
        q.awaitTermination()
        deleteRecursively(tmpPath.resolve("staging"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        s.read.parquet(s"$tmp/out").orderBy("event_id")
      },
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
                CAST(round(e.value * 100) AS BIGINT) AS v_e2
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""")
  ) ++ Map(

    // Q137: streaming upsert sink — the events changelog (event_id as
    // the change sequence, every 11th a delete) drains through a REAL
    // multi-microbatch stream (3 staged files, maxFilesPerTrigger=1)
    // into a foreachBatch last-writer-wins merge with tombstone
    // retention, so the final snapshot is INDEPENDENT of how files
    // split into batches (a delete arriving "early" still beats a
    // lower-sequence upsert arriving later). The snapshot is hash-
    // bucketed and manifest-tracked: each microbatch rewrites only the
    // buckets its keys land in (untouched buckets carry forward by
    // reference — see StreamingUpsertSpec for the byte-identical and
    // restart-recovery contracts). The oracle is the batch
    // last-writer-wins per key.
    "q137_streaming_upsert" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q137")
        val tmp = tmpPath.toString
        val changes = Tables.events(s, dir).select(
          col("user_id"),
          round(col("value") * 100).cast("long").as("v_e2"),
          col("event_id").cast("long").as("__seq"),
          when(pmod(col("event_id"), lit(11)) === 0, "delete")
            .otherwise("upsert").as("__op"))
        changes.repartition(3).write.parquet(s"$tmp/staging")
        val stream = s.readStream.schema(changes.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/staging")
        val snapshot = StreamingUpsert.mergeStream(
          s, stream, s"$tmp/snapshots", "user_id", s"$tmp/checkpoint")
        val out = StreamingUpsert.finalSnapshot(s, snapshot)
          .select(col("user_id"), col("__seq").as("src_seq"), col("v_e2"))
          .orderBy("user_id")
        deleteRecursively(tmpPath.resolve("staging"))
        deleteRecursively(tmpPath.resolve("checkpoint"))
        deleteOnExit(tmpPath)
        out
      },
      """WITH c AS (SELECT user_id, CAST(event_id AS BIGINT) AS seq,
                           CAST(round(value * 100) AS BIGINT) AS v_e2,
                           CASE WHEN event_id % 11 = 0 THEN 'delete'
                                ELSE 'upsert' END AS op
                    FROM events),
         w AS (SELECT *, row_number() OVER (PARTITION BY user_id
                           ORDER BY seq DESC) AS rn
               FROM c)
         SELECT user_id, seq AS src_seq, v_e2
         FROM w WHERE rn = 1 AND op = 'upsert' ORDER BY user_id"""),

    // Q139: multimodal frame sampling — the full decode chain end to
    // end: synthesize StubCodec payloads from doc_id arithmetic (as
    // q33), resize, partition-batched decode, then explode every
    // 3rd frame index per decodable asset into (asset_id, frame_idx)
    // work units. The oracle recomputes n_frames from doc_id and
    // unnests the same strided series; undecodable assets (every 13th)
    // must yield no frames.
    "q139_frame_sampling" -> QuerySpec(
      (s, dir) => {
        val mkPayload = udf { id: Long =>
          if (id % 13 == 0) Array[Byte](1, 2, 3)
          else Multimodal.StubCodec.encodeHeader(
            (16 + id % 64).toInt, (16 + (id * 3) % 64).toInt, (1 + id % 10).toInt)
        }
        val assets = Tables.documents(s, dir).select(
          col("doc_id").as("asset_id"),
          mkPayload(col("doc_id")).as("payload"),
          lit("video/x-graft").as("mime"),
          concat(lit("mem://assets/"), col("doc_id")).as("uri"))
        Multimodal.sampleFrames(
          Multimodal.decodeAssets(Multimodal.resize(assets, maxDim = 32)),
          stride = 3)
          .orderBy("asset_id", "frame_idx")
      },
      """WITH hdr AS (SELECT doc_id AS asset_id, 1 + doc_id%10 AS f0
                      FROM documents WHERE doc_id%13 <> 0)
         SELECT asset_id,
                CAST(unnest(generate_series(0, f0 - 1, 3)) AS INTEGER) AS frame_idx
         FROM hdr ORDER BY asset_id, frame_idx""")
  )
}
