package graft.etl

import scala.collection.immutable.ListMap

/** Programmatic defaults mirroring the reference's shipped
  * `config/app_config.yaml` — the values a fresh deployment runs with,
  * and the fixed point the test suite validates against.
  */
object EtlDefaults {

  /** `runtime.date_formats` (`config/app_config.yaml:12-22`) — order is
    * semantics: first match wins.
    */
  val dateFormats: Seq[String] = Seq(
    "%Y-%m-%d",
    "%m/%d/%Y",
    "%d-%m-%Y",
    "%Y/%m/%d",
    "%Y.%m.%d",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%d-%m-%Y %H:%M:%S",
    "%m/%d/%Y %I:%M %p")

  val dateOutputFormat = "%Y-%m-%d"
  val datetimeOutputFormat = "%Y-%m-%dT%H:%M:%S%z"

  val runtime: RuntimeConfig = RuntimeConfig(
    dateFormats = dateFormats,
    dateOutputFormat = dateOutputFormat,
    datetimeOutputFormat = datetimeOutputFormat,
    schemaPath = "sql/schema.sql",
    typeMappings = LogicalTypes.defaultSqlTypeMappings)

  val audit: AuditSettings = AuditSettings(
    businessColumns = ListMap(
      "ingested_at" -> "ingested_at",
      "source_collection" -> "source_collection",
      "status" -> "status"),
    businessColumnTypes = Map(
      "ingested_at" -> "TIMESTAMPTZ",
      "source_collection" -> "TEXT",
      "status" -> "TEXT"),
    auditSchema = "doc_audit",
    auditTable = "doc_audit.ingestion_audit",
    auditColumns = ListMap(
      "ingested_at" -> "ingested_at",
      "object_id" -> "object_id",
      "source_collection" -> "source_collection",
      "object_name" -> "object_name",
      "object_status" -> "object_status",
      "missing_columns" -> "missing_columns",
      "processing_status" -> "processing_status"),
    auditColumnTypes = Map(
      "ingested_at" -> "TIMESTAMPTZ",
      "object_id" -> "TEXT",
      "source_collection" -> "TEXT",
      "object_name" -> "TEXT",
      "object_status" -> "TEXT",
      "missing_columns" -> "JSONB",
      "processing_status" -> "TEXT"),
    statusValues = Map(
      "success" -> "success", "error" -> "error", "missing" -> "missing"),
    objectStatusValues = Map(
      "new" -> "NEW", "missing" -> "MISSING", "already_exists" -> "ALREADY_EXISTS"))

  val appConfig: AppConfig = AppConfig(
    database = DatabaseConfig(
      host = "localhost", port = 5432, name = "etl_db",
      user = "etl_user", password = "secret"),
    runtime = runtime,
    audit = audit,
    loggingLevel = "INFO")
}
