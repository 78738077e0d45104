package graft.streaming

import java.nio.file.Files
import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.etl._

class StreamingEtlSpec extends AnyFunSuite with SparkTestSession {

  test("streaming ETL drains staged JSONL through the shared transform into the sink") {
    val staging = Files.createTempDirectory("graft-staging")
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val base = Files.createTempDirectory("graft-stream-sink").toString
    Files.writeString(staging.resolve("part-0.jsonl"),
      """{"_id": 1, "name": "Ada", "joined": "03/04/2025"}
        |{"_id": 2, "joined": "bad"}
        |""".stripMargin)

    val cm = CollectionMapping("public.people_s", "raw_json", "_id", ListMap(
      "_id" -> AttributeMapping("person_id", "integer"),
      "name" -> AttributeMapping("full_name", "text"),
      "joined" -> AttributeMapping("joined_date", "date")))
    val sink = new ParquetSink(base)
    sink.createTable("public.people_s", Seq.empty)

    val q = StreamingEtl.run(
      spark, staging.toString, checkpoint, "people", cm,
      EtlDefaults.runtime, EtlDefaults.audit, sink,
      clock = lit("2026-01-01 00:00:00").cast("timestamp"))
    q.awaitTermination(60000)

    val target = sink.read(spark, "public.people_s").orderBy("person_id").collect()
    assert(target.length == 2)
    assert(target(0).getAs[String]("joined_date") == "2025-03-04")
    assert(target(0).getAs[String]("status") == "success")
    assert(target(1).getAs[String]("status") == "error") // bad date
    val audit = sink.read(spark, "doc_audit.ingestion_audit")
    assert(audit.count() == 2)
    assert(audit.filter(col("missing_columns") === """["full_name"]""").count() == 1)
  }

  test("windowed counts + streaming dedup plans are valid streaming plans") {
    import spark.implicits._
    // Plan-level check on a batch frame with the same shapes the stream uses.
    val events = Seq(("2026-01-01 10:05:00", "click"), ("2026-01-01 10:20:00", "click"))
      .toDF("ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val counts = StreamingEtl.windowedCounts(events, "ts", "event_type").collect()
    assert(counts.length == 1 && counts(0).getAs[Long]("cnt") == 2L)
    val deduped = Seq((1L, "2026-01-01 10:05:00"), (2L, "2026-01-01 10:06:00"))
      .toDF("doc_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    assert(deduped.withWatermark("ts", "1 hour").dropDuplicates("doc_id").count() == 2)
  }
}
