package graft.etl

import java.nio.file.{Files, Paths}

/** S4 — DDL scan of the deployment schema script, reference
  * `etl_pipeline/schema_utils.py:8-26`: regex-extract the table names of
  * every `CREATE TABLE IF NOT EXISTS`, normalized to lowercase
  * `schema.table` with default schema `public`
  * (`postgres_loader.py:177-181`).
  */
object SchemaScript {

  private val CreateTablePattern =
    """(?i)CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\s+([^\s(]+)""".r

  def scanTables(content: String): Set[String] =
    CreateTablePattern.findAllMatchIn(content).map(m => normalizeTableName(m.group(1))).toSet

  def loadSchemaTables(schemaPath: String): Set[String] = {
    val path = Paths.get(schemaPath)
    if (!Files.exists(path))
      throw new ConfigError(s"Schema file not found: $schemaPath")
    scanTables(Files.readString(path))
  }

  /** `postgres_loader.split_table_name` — `"s.t"` → (s, t); unqualified
    * names default to schema `public`.
    */
  def splitTableName(tableName: String): (String, String) =
    tableName.split("\\.", 2) match {
      case Array(schema, table) => (schema, table)
      case Array(table) => ("public", table)
    }

  def normalizeTableName(tableName: String): String = {
    val (schema, table) = splitTableName(tableName)
    s"${schema.toLowerCase}.${table.toLowerCase}"
  }
}
