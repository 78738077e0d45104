package graft.etl

import java.nio.file.Files
import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The reference UI's auto-mapping flow (§3.2): stage an envelope with
  * NO mapping config, infer the placeholder mapping (I1–I4 →
  * `_build_mapping_config`), then run the batch pipeline with it —
  * inference and transform compose end-to-end.
  */
class InferredPipelineSpec extends AnyFunSuite with SparkTestSession {

  test("infer mapping from staged docs, then run the pipeline with it") {
    val envelope =
      """{"sensors": [
        |  {"_id": 1, "reading": 4.5, "active": true, "seen": "2025-03-04", "site": "A"},
        |  {"_id": 2, "reading": 3,   "active": false, "seen": "03/05/2025"},
        |  {"_id": 3, "reading": 9.25, "active": true, "seen": "2025-03-06", "site": "B"}
        |]}""".stripMargin
    val inputPath = Files.createTempFile("graft-infer-input", ".json")
    Files.writeString(inputPath, envelope)
    val input = Ingestion.loadEnvelope(spark, inputPath.toString)

    // infer the placeholder mapping exactly as run_pipeline.py would
    val cm = SchemaInference.inferMapping(input("sensors"), "raw", "sensors")
    assert(cm.objectIdAttribute == "_id")
    assert(cm.mappings("_id").typeName == "integer")
    assert(cm.mappings("reading").typeName == "numeric") // {numeric,integer} → numeric
    assert(cm.mappings("active").typeName == "boolean")
    assert(cm.mappings("seen").typeName == "date")
    assert(cm.mappings("site").typeName == "text")

    // run the batch pipeline with the inferred mapping
    val schemaSql = Files.createTempFile("graft-infer-schema", ".sql")
    Files.writeString(schemaSql, "-- no declared tables\n")
    val app = EtlDefaults.appConfig.copy(
      runtime = EtlDefaults.runtime.copy(schemaPath = schemaSql.toString))
    val sink = new ParquetSink(Files.createTempDirectory("graft-infer-sink").toString)
    val result = Pipeline.run(
      spark, ListMap("sensors" -> input("sensors")), app,
      MappingConfig(ListMap("sensors" -> cm)), sink,
      clock = lit("2026-03-04 00:00:00").cast("timestamp"), ingestionDate = "2026-03-04")

    assert(result.objectStatuses == Map("public.sensors" -> "NEW"))
    val rows = sink.read(spark, "public.sensors").orderBy("_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("seen")).toSeq ==
      Seq("2025-03-04", "2025-03-05", "2025-03-06")) // both formats canonicalized
    assert(rows(1).getAs[String]("site") == null)
    assert(rows.forall(_.getAs[String]("status") == "success"))
    val audit = sink.read(spark, "doc_audit.ingestion_audit")
    assert(audit.filter(col("missing_columns") === """["site"]""").count() == 1)
  }
}
