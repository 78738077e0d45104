package graft.etl

import java.nio.file.Files
import scala.collection.immutable.ListMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end golden run: envelope JSON → shape validation → transform →
  * ParquetSink target/audit/report tables → report derivation, with a
  * pinned clock so outputs are byte-stable. Plus the K2 DDL golden
  * against the reference's `sql/schema.sql` shape.
  */
class PipelineSpec extends AnyFunSuite with SparkTestSession {

  private val customersMapping = CollectionMapping(
    "public.customers", "raw_json", "customer_id", ListMap(
      "customer_id" -> AttributeMapping("customer_id", "integer"),
      "name" -> AttributeMapping("name", "text"),
      "signup_date" -> AttributeMapping("signup_date", "date"),
      "email" -> AttributeMapping("email", "text")))

  private val ordersMapping = CollectionMapping(
    "public.orders", "raw_json", "order_id", ListMap(
      "order_id" -> AttributeMapping("order_id", "integer"),
      "customer_id" -> AttributeMapping("customer_id", "integer"),
      "order_date" -> AttributeMapping("order_date", "date"),
      "amount" -> AttributeMapping("amount", "numeric")))

  // --- S1 shape validation -------------------------------------------------

  test("envelope shape validation mirrors ingestion.py") {
    assertThrows[InputError](Ingestion.parseEnvelope("[1, 2]"))
    assertThrows[InputError](Ingestion.parseEnvelope("""{"c": 1}"""))
    assertThrows[InputError](Ingestion.parseEnvelope("""{"c": [1]}"""))
    assertThrows[InputError](Ingestion.parseEnvelope("not json"))
    val ok = Ingestion.parseEnvelope("""{"a": [{"x": 1}], "b": []}""")
    assert(ok.keys.toSeq == Seq("a", "b"))
    assert(ok("a") == Seq("""{"x":1}""") && ok("b").isEmpty)
    assertThrows[InputError](Ingestion.loadEnvelope(spark, "/nonexistent.json"))
  }

  // --- K2 DDL golden -------------------------------------------------------

  test("DDL synthesis matches sql/schema.sql column shape") {
    val cols = SchemaManager.buildTableColumns(
      customersMapping, LogicalTypes.defaultSqlTypeMappings,
      EtlDefaults.audit.businessColumns.toSeq, EtlDefaults.audit.businessColumnTypes)
    // schema.sql:1-10 modulo the TIMESTAMPTZ spelling
    assert(cols.map(c => (c.name, c.sqlType, c.notNull)) == Seq(
      ("customer_id", "INTEGER", false),
      ("name", "TEXT", false),
      ("signup_date", "DATE", false),
      ("email", "TEXT", false),
      ("raw_json", "JSONB", true),
      ("ingested_at", "TIMESTAMPTZ", true),
      ("source_collection", "TEXT", true),
      ("status", "TEXT", true)))
    assert(SchemaManager.createTableSql("public.customers", cols) ==
      """CREATE TABLE IF NOT EXISTS "public"."customers" ("customer_id" INTEGER, """ +
        """"name" TEXT, "signup_date" DATE, "email" TEXT, "raw_json" JSONB NOT NULL, """ +
        """"ingested_at" TIMESTAMPTZ NOT NULL, "source_collection" TEXT NOT NULL, """ +
        """"status" TEXT NOT NULL)""")
    // duplicate target column → rejected (schema_manager.py:40-43)
    val dup = customersMapping.copy(mappings =
      customersMapping.mappings + ("extra" -> AttributeMapping("raw_json", "text")))
    assertThrows[ConfigError](SchemaManager.buildTableColumns(
      dup, LogicalTypes.defaultSqlTypeMappings,
      EtlDefaults.audit.businessColumns.toSeq, EtlDefaults.audit.businessColumnTypes))
    // audit table columns match schema.sql:25-33 order
    assert(SchemaManager.buildAuditTableColumns(EtlDefaults.audit).map(_.name) ==
      Seq("ingested_at", "object_id", "source_collection", "object_name",
        "object_status", "missing_columns", "processing_status"))
  }

  // --- E2E golden run ------------------------------------------------------

  test("golden end-to-end run: targets, audit, reports, counters") {
    val base = Files.createTempDirectory("graft-e2e").toString
    val schemaSql = Files.createTempFile("graft-schema", ".sql")
    Files.writeString(schemaSql,
      """CREATE TABLE IF NOT EXISTS public.legacy_t (x TEXT);
        |CREATE TABLE IF NOT EXISTS doc_audit.ingestion_audit (x TEXT);
        |""".stripMargin)
    val app = EtlDefaults.appConfig.copy(
      runtime = EtlDefaults.runtime.copy(schemaPath = schemaSql.toString))
    val mapping = MappingConfig(ListMap(
      "customers" -> customersMapping,
      "orders" -> ordersMapping,
      "ghosts" -> customersMapping.copy(targetTable = "public.ghosts")))

    val envelope =
      """{"customers": [
        |  {"customer_id": 1, "name": "Ada", "signup_date": "03/04/2025", "email": "a@x"},
        |  {"customer_id": 2, "name": "Bob", "signup_date": "bad-date"},
        |  {"customer_id": 3, "name": null, "signup_date": "2025-01-15", "email": "c@x"}
        |],
        |"orders": [
        |  {"order_id": 10, "customer_id": 1, "order_date": "2025-02-01", "amount": 5.50}
        |],
        |"strays": [{"s": 1}]}""".stripMargin
    val inputPath = Files.createTempFile("graft-input", ".json")
    Files.writeString(inputPath, envelope)

    val sink = new ParquetSink(base)
    val clock = lit("2026-02-03 04:05:06").cast("timestamp")
    val result = Pipeline.run(
      spark, Ingestion.loadEnvelope(spark, inputPath.toString),
      app, mapping, sink, clock = clock, ingestionDate = "2026-02-03")

    // planning sets (J3/J4/T11)
    assert(result.missingCollections == Set("ghosts"))
    assert(result.unmappedCollections == Set("strays"))
    assert(result.missingTablesInput == Set("public.legacy_t"))
    assert(result.objectStatuses == Map(
      "public.legacy_t" -> "MISSING",
      "public.customers" -> "NEW",
      "public.orders" -> "NEW"))

    // target golden (pinned clock; date canonicalized; error row has NULL)
    val customers = sink.read(spark, "public.customers").orderBy("customer_id")
    assert(customers.columns.toSeq == Seq("customer_id", "name", "signup_date",
      "email", "raw_json", "ingested_at", "source_collection", "status"))
    val rows = customers.collect()
    assert(rows.map(_.getAs[Int]("customer_id")).toSeq == Seq(1, 2, 3))
    assert(rows(0).getAs[String]("signup_date") == "2025-03-04")
    assert(rows(0).getAs[String]("status") == "success")
    assert(rows(1).getAs[String]("signup_date") == null) // cast failure
    assert(rows(1).getAs[String]("status") == "error")
    assert(rows(2).getAs[String]("name") == null) // JSON null passthrough
    assert(rows(2).getAs[String]("status") == "success")
    assert(rows.forall(_.getAs[java.sql.Timestamp]("ingested_at").toString
      == "2026-02-03 04:05:06.0"))

    // audit golden: 3 customers + 1 order + 1 missing-table row
    val audit = sink.read(spark, "doc_audit.ingestion_audit")
    assert(audit.count() == 5)
    val missingRow = audit.filter(col("object_name") === "public.legacy_t").head()
    assert(missingRow.getAs[String]("processing_status") == "missing")
    assert(missingRow.getAs[String]("object_status") == "MISSING")
    val bobAudit = audit.filter(col("object_id") === "2").head()
    assert(bobAudit.getAs[String]("processing_status") == "error")
    assert(bobAudit.getAs[String]("missing_columns") == """["email"]""")

    // report tables (K5)
    val statuses = sink.read(spark, "doc_audit.missing_collections_report")
    assert(statuses.count() == 3)
    val missingAttrs = sink.read(spark, "doc_audit.missing_attributes_report")
    val ma = missingAttrs.collect().map(r =>
      r.getAs[String]("object_name") -> r.getAs[String]("missing_columns")).toMap
    assert(ma == Map("public.customers" -> """["email"]"""))

    // counters (A8 over audit rows)
    val counters = result.counters.get.orderBy("collection").collect()
    assert(counters.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      ("customers", 3L, 1L, 0L, 2L),
      ("orders", 1L, 0L, 0L, 1L)))
  }

  test("missing-in-db table: rows rejected, audit says missing") {
    val base = Files.createTempDirectory("graft-e2e2").toString
    val schemaSql = Files.createTempFile("graft-schema2", ".sql")
    // customers IS declared in schema.sql but the sink has no such table
    Files.writeString(schemaSql, "CREATE TABLE IF NOT EXISTS public.customers (x TEXT);")
    val app = EtlDefaults.appConfig.copy(
      runtime = EtlDefaults.runtime.copy(schemaPath = schemaSql.toString))
    val mapping = MappingConfig(ListMap("customers" -> customersMapping))
    import spark.implicits._
    val input = ListMap("customers" ->
      Seq("""{"customer_id": 1, "name": "Ada"}""").toDF("raw"))
    val sink = new ParquetSink(base)
    val result = Pipeline.run(spark, input, app, mapping, sink,
      clock = lit("2026-02-03 04:05:06").cast("timestamp"), ingestionDate = "2026-02-03")
    assert(result.missingTablesDb == Set("public.customers"))
    assert(result.objectStatuses("public.customers") == "MISSING")
    assert(!sink.tableExists("public.customers")) // no target write happened
    val audit = sink.read(spark, "doc_audit.ingestion_audit")
    assert(audit.head().getAs[String]("processing_status") == "missing")
    // counters: the doc counts as insert failure, not processed
    val c = result.counters.get.head()
    assert((c.getLong(1), c.getLong(3)) == (0L, 1L))
  }

  test("a failing append releases every cache registered by the run") {
    val base = Files.createTempDirectory("graft-fail").toString
    val schemaSql = Files.createTempFile("graft-schema", ".sql")
    Files.writeString(schemaSql, "")
    val app = EtlDefaults.appConfig.copy(
      runtime = EtlDefaults.runtime.copy(schemaPath = schemaSql.toString))
    val mapping = MappingConfig(ListMap("customers" -> customersMapping))
    import spark.implicits._
    val input = ListMap("customers" ->
      Seq("""{"customer_id": 1, "name": "Ada"}""").toDF("raw"))
    val inner = new ParquetSink(base)
    val sink = new TableSink {
      override def tableExists(t: String) = inner.tableExists(t)
      override def createSchema(s: String) = inner.createSchema(s)
      override def createTable(t: String, cols: Seq[ColumnDef]) =
        inner.createTable(t, cols)
      override def append(df: org.apache.spark.sql.DataFrame, t: String) =
        if (t == app.audit.auditTable) throw new LoadError("audit sink down")
        else inner.append(df, t)
    }
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    assertThrows[LoadError] {
      Pipeline.run(spark, input, app, mapping, sink,
        clock = lit("2026-02-03 04:05:06").cast("timestamp"),
        ingestionDate = "2026-02-03")
    }
    // round-4 advice: the just-persisted audit frame (registered before
    // the append) must be released when the run fails
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore)
  }
}
