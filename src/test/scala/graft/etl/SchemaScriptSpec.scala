package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** S4 DDL scan + table-name normalization,
  * reference `etl_pipeline/schema_utils.py:8-26`.
  */
class SchemaScriptSpec extends AnyFunSuite {

  test("scan extracts CREATE TABLE IF NOT EXISTS names, normalized") {
    val ddl =
      """CREATE TABLE IF NOT EXISTS public.Customers (
        |    id INTEGER
        |);
        |create table if not exists Orders(id INTEGER);
        |CREATE SCHEMA IF NOT EXISTS doc_audit;
        |CREATE TABLE IF NOT EXISTS doc_audit.ingestion_audit (x TEXT);
        |CREATE TABLE plain_no_if (x TEXT);
        |""".stripMargin
    assert(SchemaScript.scanTables(ddl) ==
      Set("public.customers", "public.orders", "doc_audit.ingestion_audit"))
  }

  test("split and normalize table names") {
    assert(SchemaScript.splitTableName("a.b") == ("a", "b"))
    assert(SchemaScript.splitTableName("b") == ("public", "b"))
    assert(SchemaScript.normalizeTableName("A.B") == "a.b")
    assert(SchemaScript.normalizeTableName("T") == "public.t")
  }

  test("missing schema file rejected") {
    assertThrows[ConfigError](SchemaScript.loadSchemaTables("/nonexistent/schema.sql"))
  }

  test("file-based scan") {
    val f = Files.createTempFile("graft-schema", ".sql")
    Files.writeString(f, "CREATE TABLE IF NOT EXISTS t1 (x TEXT);")
    assert(SchemaScript.loadSchemaTables(f.toString) == Set("public.t1"))
  }

  test("host allow-list guard (F5)") {
    HostGuard.requireLocal("localhost")
    HostGuard.requireLocal("127.0.0.1")
    assertThrows[ConfigError](HostGuard.requireLocal("db.example.com"))
  }
}
