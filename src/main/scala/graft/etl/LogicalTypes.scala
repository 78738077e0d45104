package graft.etl

import org.apache.spark.sql.types._

/** The reference's closed logical type system: 16 logical names (after
  * trim+lowercase normalization) onto 9 physical SQL types.
  * See reference `etl_pipeline/type_utils.py:1-26` and the
  * `runtime.type_mappings` table in `config/app_config.yaml:26-42`.
  *
  * Two deliberate Spark-side decisions (SURVEY §1.2):
  *  - `numeric`/`decimal` map to DecimalType(38,18) — Postgres NUMERIC is
  *    unbounded; divergence documented, oracle data stays within range.
  *  - `date`/`datetime` map to StringType: the reference re-serializes
  *    parsed dates to canonical strings (`transformer.py:70,75`) and only
  *    Postgres turns them back into DATE/TIMESTAMPTZ. The canonical
  *    string IS the observable contract.
  */
object LogicalTypes {

  /** `type_utils.normalize_type` — trim + lowercase. */
  def normalize(typeName: String): String = typeName.trim.toLowerCase

  /** `type_utils.SUPPORTED_TYPES` — the closed set of legal logical types. */
  val supported: Set[String] = Set(
    "text", "string", "varchar",
    "integer", "int", "bigint", "smallint",
    "float", "double", "double precision",
    "numeric", "decimal",
    "boolean", "bool",
    "date", "datetime")

  val decimalPrecision = 38
  val decimalScale = 18

  /** Spark storage type for a normalized logical type. */
  def sparkType(normalized: String): DataType = normalized match {
    case "text" | "string" | "varchar" => StringType
    case "integer" | "int"             => IntegerType
    case "bigint"                      => LongType
    case "smallint"                    => ShortType
    case "float" | "double" | "double precision" => DoubleType
    case "numeric" | "decimal"         => DecimalType(decimalPrecision, decimalScale)
    case "boolean" | "bool"            => BooleanType
    case "date" | "datetime"           => StringType // canonical output string
    case other =>
      throw new ConfigError(s"Unsupported logical type '$other'.")
  }

  /** The reference's default logical→Postgres physical mapping
    * (`config/app_config.yaml:26-42`).
    */
  val defaultSqlTypeMappings: Map[String, String] = Map(
    "text" -> "TEXT", "string" -> "TEXT", "varchar" -> "TEXT",
    "integer" -> "INTEGER", "int" -> "INTEGER",
    "bigint" -> "BIGINT", "smallint" -> "SMALLINT",
    "float" -> "DOUBLE PRECISION", "double" -> "DOUBLE PRECISION",
    "double precision" -> "DOUBLE PRECISION",
    "numeric" -> "NUMERIC", "decimal" -> "NUMERIC",
    "boolean" -> "BOOLEAN", "bool" -> "BOOLEAN",
    "date" -> "DATE", "datetime" -> "TIMESTAMPTZ")

  /** `type_utils.normalize_type_mappings` — normalize the keys. */
  def normalizeTypeMappings(mappings: Map[String, String]): Map[String, String] =
    mappings.map { case (k, v) => normalize(k) -> v }
}
