package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The ETL transform plane (reference T1–T10,
  * `etl_pipeline/transformer.py:7-125` + `pipeline.py:188-249`),
  * re-expressed as ONE declarative projection over a raw-JSON-document
  * DataFrame.
  *
  * Spark-first design: each document is parsed ONCE per row with
  * `parse_json` into a VariantType column; every per-attribute semantic
  * (missing-vs-null, JSON-type-aware cast dispatch, first-match
  * multi-format dates, error capture) is a Column expression over that
  * variant — the whole transform is a single `Project` that Catalyst
  * pipelines into the scan, with nothing row-at-a-time and nothing on
  * the driver. Variant access distinguishes exactly what the reference's
  * Python dict sees:
  *   - attribute absent        → `variant_get` is SQL NULL        (T2)
  *   - attribute JSON null     → `is_variant_null`                (null passthrough)
  *   - JSON value type         → `schema_of_variant`              (T3 dispatch)
  *
  * Cast semantics matched to `transform_value` (`transformer.py:43-79`):
  * `int()` truncates numerics toward zero but rejects non-integral
  * strings; `Decimal(str(v))` is exact; booleans use the token table
  * (`transformer.py:114-125`); dates try the configured formats in
  * declared order, first match wins, and re-serialize to the canonical
  * output string (`transformer.py:82-111`). Cast failure → NULL + an
  * `"attr: message"` error entry, never an abort (T9).
  *
  * Documented divergences (SURVEY §7.4): offsets normalize to UTC
  * (`+0000`) instead of preserving the original offset; `%f` needs
  * exactly 6 digits; Python `str()` of dicts/lists renders here as JSON;
  * integral overflow beyond the target width is an error rather than
  * Python's unbounded int; and for TEXT-typed attributes holding JSON
  * numbers, the rendering is Spark's cast-to-string, not Python `repr`
  * — variant decimals keep their scale's trailing zeros (`5.50` where
  * Python str(Decimal) may print `5.5`) and large doubles render as
  * `1.0E20` where Python prints `1e+20`.
  */
object Transform {

  /** Target rows + audit rows for one collection, both derived from the
    * single-pass `shared` projection (scan + parse_json + all casts).
    * Callers writing both MUST persist `shared` around the two actions —
    * Spark's CacheManager substitutes the cached relation into both
    * children by plan match — or the dominant scan+parse cost runs once
    * per consumer. `Pipeline.run` does this.
    */
  final case class TransformedCollection(
      target: DataFrame, audit: DataFrame, shared: DataFrame)

  private val V = "__graft_variant"

  /** Variant path for a top-level attribute (bracket-quoted so dots or
    * spaces in attribute names stay literal).
    */
  private def path(attr: String): String =
    if (attr.matches("[A-Za-z_][A-Za-z0-9_]*")) s"$$.$attr"
    else "$['" + attr.replace("'", "\\'") + "']"

  /** All per-attribute derived expressions for one mapping entry. */
  private final case class AttrExprs(
      targetColumn: String,
      value: Column,
      missing: Column,
      error: Column)

  private def attrExprs(
      v: Column,
      sourceAttr: String,
      am: AttributeMapping,
      runtime: RuntimeConfig): AttrExprs = {
    val normalized = LogicalTypes.normalize(am.typeName)
    if (!LogicalTypes.supported.contains(normalized))
      throw new ConfigError(s"Unsupported target type '${am.typeName}'")

    val vg = variant_get(v, path(sourceAttr), "variant")
    val missing = vg.isNull
    val jsonNull = is_variant_null(vg)
    val hasValue = vg.isNotNull && !jsonNull
    val vt = schema_of_variant(vg) // BIGINT | DECIMAL(p,s) | DOUBLE | STRING | BOOLEAN | VOID | ARRAY<..> | OBJECT<..>
    val isBool = vt === "BOOLEAN"
    val isString = vt === "STRING"
    val isNumeric = vt === "BIGINT" || vt === "DOUBLE" || vt.startsWith("DECIMAL")
    val asString = vg.try_cast("string")

    def decimalType = s"decimal(${LogicalTypes.decimalPrecision},${LogicalTypes.decimalScale})"

    // Python str(value): booleans render capitalized; everything else via cast.
    def textValue: Column =
      when(isBool, when(vg.try_cast("boolean"), "True").otherwise("False"))
        .otherwise(asString)

    def integralValue(target: String): Column =
      when(isBool, when(vg.try_cast("boolean"), 1).otherwise(0).cast(target))
        .when(isNumeric, vg.try_cast(decimalType).try_cast(target)) // truncates toward zero like int()
        .when(isString, trim(asString).try_cast(target)) // integral strings only, like int(s)
        .otherwise(lit(null).cast(target))

    def doubleValue: Column =
      when(isBool, when(vg.try_cast("boolean"), 1d).otherwise(0d))
        .when(isNumeric, vg.try_cast("double"))
        .when(isString, trim(asString).try_cast("double"))
        .otherwise(lit(null).cast("double"))

    // Decimal(str(value)): exact for numerics and numeric strings;
    // Decimal("True") raises → booleans are errors here, like Python.
    def decimalValue: Column =
      when(isNumeric, vg.try_cast(decimalType))
        .when(isString, trim(asString).try_cast(decimalType))
        .otherwise(lit(null).cast(decimalType))

    def booleanValue: Column =
      when(isBool, vg.try_cast("boolean"))
        .when(isNumeric, vg.try_cast("double") =!= 0d)
        .when(isString,
          when(lower(trim(asString)).isin("true", "t", "yes", "y", "1"), true)
            .when(lower(trim(asString)).isin("false", "f", "no", "n", "0"), false)
            .otherwise(lit(null).cast("boolean")))
        .otherwise(lit(null).cast("boolean"))

    // First-match multi-format parse chain (T4): one try_to_timestamp per
    // configured format, coalesced in declared order.
    lazy val parses: Seq[Column] = runtime.dateFormats.map { f =>
      try_to_timestamp(asString, lit(StrptimeFormats.toParsePattern(f)))
    }
    lazy val parsedTs: Column = coalesce(parses: _*)
    lazy val matchedHasOffset: Column =
      runtime.dateFormats.zip(parses)
        .foldRight(lit(false)) { case ((f, p), acc) =>
          when(p.isNotNull, lit(StrptimeFormats.hasOffsetDirective(f))).otherwise(acc)
        }

    /** Render `ts` through a strftime output format; `%z` renders as the
      * session-zone offset (`+0000` under UTC) when the matched input
      * format carried an offset, else empty — mirroring strftime on
      * naive vs aware datetimes.
      */
    def renderOutput(ts: Column, outputFormat: String): Column = {
      val parts = outputFormat.split("%z", -1)
      val rendered: Seq[Column] = parts.zipWithIndex.flatMap { case (part, i) =>
        val formatted: Seq[Column] =
          if (part.isEmpty) Seq.empty
          else Seq(date_format(ts, StrptimeFormats.toFormatPattern(part)))
        if (i < parts.length - 1)
          formatted :+ when(matchedHasOffset, date_format(ts, "xx")).otherwise("")
        else formatted
      }.toSeq
      if (rendered.isEmpty) lit("") else concat(rendered: _*)
    }

    def dateValue: Column =
      when(isString, renderOutput(to_timestamp(to_date(parsedTs)), runtime.dateOutputFormat))
        .otherwise(lit(null).cast("string"))

    def datetimeValue: Column =
      when(isString, renderOutput(parsedTs, runtime.datetimeOutputFormat))
        .otherwise(lit(null).cast("string"))

    val value: Column = normalized match {
      case "text" | "string" | "varchar"            => textValue
      case "integer" | "int"                        => integralValue("int")
      case "bigint"                                 => integralValue("bigint")
      case "smallint"                               => integralValue("smallint")
      case "float" | "double" | "double precision"  => doubleValue
      case "numeric" | "decimal"                    => decimalValue
      case "boolean" | "bool"                       => booleanValue
      case "date"                                   => dateValue
      case "datetime"                               => datetimeValue
    }

    // Cast failure → NULL + message (transformer.py:76-79); text never fails.
    val message = normalized match {
      case "text" | "string" | "varchar" => None
      case "date"                        => Some("invalid date format")
      case "datetime"                    => Some("invalid datetime format")
      case _                             => Some(s"invalid value for type '${am.typeName}'")
    }
    val error: Column = message match {
      case None      => lit(null).cast("string")
      case Some(msg) =>
        when(hasValue && value.isNull, lit(s"$sourceAttr: $msg"))
          .otherwise(lit(null).cast("string"))
    }

    AttrExprs(am.column, when(hasValue, value), missing, error)
  }

  /** Python `str(value)` for the audit object id (T10): string
    * passthrough, capitalized booleans, numbers via cast.
    */
  private def objectIdExpr(v: Column, attr: String): Column = {
    val vg = variant_get(v, path(attr), "variant")
    when(vg.isNotNull && !is_variant_null(vg),
      when(schema_of_variant(vg) === "BOOLEAN",
        when(vg.try_cast("boolean"), "True").otherwise("False"))
        .otherwise(vg.try_cast("string")))
  }

  /** Full single-collection transform: returns the target-row DataFrame
    * and the audit-row DataFrame (K4 shape, `audit.py:13-31`), both
    * derived from one shared projection.
    *
    * @param raw          DataFrame holding raw JSON document strings
    * @param rawCol       name of the raw-JSON string column in `raw`
    * @param collectionName source collection (T8 business column)
    * @param cm           the collection's mapping config
    * @param objectStatus T11 classification for the destination table
    *                     (NEW / MISSING / ALREADY_EXISTS), decided in the
    *                     sink plane
    * @param clock        injectable ingestion timestamp (golden tests pin
    *                     it; default wall clock like `audit.py:7`)
    */
  def transformCollection(
      raw: DataFrame,
      rawCol: String,
      collectionName: String,
      cm: CollectionMapping,
      runtime: RuntimeConfig,
      audit: AuditSettings,
      objectStatus: String = "ALREADY_EXISTS",
      clock: Column = current_timestamp()): TransformedCollection = {

    val withV = raw.withColumn(V, parse_json(col(rawCol)))
    val v = col(V)
    val attrs = cm.mappings.toSeq.map { case (attr, am) => attrExprs(v, attr, am, runtime) }

    val missingColumns: Column =
      array_compact(array(attrs.map(a => when(a.missing, lit(a.targetColumn))): _*))
    val errors: Column =
      array_compact(array(attrs.map(_.error): _*))
    val statusCol: Column =
      when(size(errors) > 0, audit.statusValues("error"))
        .otherwise(audit.statusValues("success"))

    val base = withV.select(
      Seq(col(rawCol).as("__raw")) ++
        attrs.map(a => a.value.as(a.targetColumn)) ++
        Seq(
          missingColumns.as("__missing_columns"),
          errors.as("__errors"),
          statusCol.as("__status"),
          objectIdExpr(v, cm.objectIdAttribute).as("__object_id")): _*)

    val bc = audit.businessColumns
    val target = base.select(
      attrs.map(a => col(a.targetColumn)) ++
        Seq(
          col("__raw").as(cm.rawJsonColumn), // T7: original document verbatim
          clock.as(bc("ingested_at")),
          lit(collectionName).as(bc("source_collection")),
          col("__status").as(bc("status"))): _*)

    val ac = audit.auditColumns
    val auditDf = base.select(
      clock.as(ac("ingested_at")),
      col("__object_id").as(ac("object_id")),
      lit(collectionName).as(ac("source_collection")),
      lit(cm.targetTable).as(ac("object_name")),
      lit(objectStatus).as(ac("object_status")),
      col("__missing_columns").as(ac("missing_columns")),
      col("__status").as(ac("processing_status")))

    TransformedCollection(target, auditDf, base)
  }

  /** Diagnostic variant used by the oracle query: target columns plus
    * the audit-derived columns in one flat DataFrame (no timestamp, so
    * the output is deterministic).
    */
  def transformFlat(
      raw: DataFrame,
      rawCol: String,
      cm: CollectionMapping,
      runtime: RuntimeConfig,
      audit: AuditSettings): DataFrame = {
    val withV = raw.withColumn(V, parse_json(col(rawCol)))
    val v = col(V)
    val attrs = cm.mappings.toSeq.map { case (attr, am) => attrExprs(v, attr, am, runtime) }
    val missingColumns =
      array_compact(array(attrs.map(a => when(a.missing, lit(a.targetColumn))): _*))
    val errors = array_compact(array(attrs.map(_.error): _*))
    withV.select(
      attrs.map(a => a.value.as(a.targetColumn)) ++
        Seq(
          col(rawCol).as(cm.rawJsonColumn),
          to_json(missingColumns).as("missing_columns"),
          size(errors).as("n_errors"),
          when(size(errors) > 0, audit.statusValues("error"))
            .otherwise(audit.statusValues("success")).as("status"),
          objectIdExpr(v, cm.objectIdAttribute).as("object_id")): _*)
  }
}
