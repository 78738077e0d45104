package graft.etl

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.functions._

/** Schema-inference operators I1–I4 (reference
  * `ui/run_pipeline.py:261-355`), as ONE distributed aggregation:
  *
  *   parse_json → cast to map<string,variant> → explode →
  *   per-value type label (I3) → groupBy(attribute) collect_set (I2) →
  *   vote resolution + object-id pick (I4).
  *
  * The reference scans ALL documents (not a sample) — so does this; at
  * scale the labeling is map-side and the shuffle carries one row per
  * (attribute, distinct-label), i.e. tiny.
  *
  * Vote resolution (`_infer_type`, `run_pipeline.py:278-299`): no
  * observed types → text; a single type wins; {integer,numeric} →
  * numeric; any other mix → text. String sniffing (`_infer_value_type`,
  * `:302-319`) probes datetime formats BEFORE date formats, then
  * integer, then float, else text. JSON null values don't vote but keep
  * the attribute in the union (I1).
  */
object SchemaInference {

  /** `DATE_ONLY_FORMATS` (`run_pipeline.py:18-24`). */
  val dateOnlyFormats: Seq[String] =
    Seq("%Y-%m-%d", "%m/%d/%Y", "%d-%m-%Y", "%Y/%m/%d", "%Y.%m.%d")

  /** `DATETIME_FORMATS` (`run_pipeline.py:26-32`). */
  val datetimeFormats: Seq[String] = Seq(
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%d-%m-%Y %H:%M:%S",
    "%m/%d/%Y %I:%M %p")

  /** First-match parse via [[graft.functions.MultiFormatTimestamp]]
    * (r20): the `coalesce(try_to_timestamp × N)` chain this replaces
    * threw a caught DateTimeParseException per non-matching format per
    * string value — on the inference plane that is several exception
    * constructions per document attribute, the dominant per-value cost
    * (q12 measured 1.35 s vs 0.53 s for its scan+explode base). The
    * native expression runs the same Spark `TimestampFormatter`s
    * through the exception-free `parseOptional` path plus a per-format
    * quick-reject, and is differentially pinned against the old chain
    * in VariantExprsSpec. Only nullness is consumed here, so the two
    * are label-equivalent by the spec's value-for-value equality.
    */
  private def firstMatch(s: Column, formats: Seq[String]): Column =
    GraftExpressionBridge.column(graft.functions.MultiFormatTimestamp(
      GraftExpressionBridge.expression(s),
      formats.map(StrptimeFormats.toParsePattern))).getField("ts")

  /** Cheap structural pre-filters in front of the `try_to_timestamp`
    * ladders. Every configured datetime format contains a literal `:`
    * (so no colon-free string can ever parse), and every date-only
    * format is exactly three unsigned digit groups joined by one of
    * `-/.` — a string failing these shapes skips all 5–10 per-format
    * parse attempts. Pure short-circuit: the guards accept a superset
    * of what the parse ladder accepts, so labels are unchanged; they
    * exist because exception-driven format probing dominates inference
    * cost on non-date strings (free text, numeric strings), which at
    * corpus scale is most of the values.
    */
  private val dateShape = "^[0-9]+[-/.][0-9]+[-/.][0-9]+$"

  /** I3 — the per-value type label for a variant value (null for JSON
    * nulls, which must not vote).
    *
    * `sniffNumericStrings=false` selects the reference's second
    * inferrer variant (`ui/mapping_editor.py:315-350`), which probes
    * datetime/date formats but treats numeric strings as text.
    */
  def valueTypeLabel(vv: Column, sniffNumericStrings: Boolean = true): Column =
    labelFromParts(vv, vv.try_cast("string"), sniffNumericStrings)

  /** The label body over pre-extracted parts: `s` is the value's string
    * rendering, passed in so [[inferSchema]] can STAGE it once per value
    * as a column — the CaseWhen ladder references the string up to four
    * times (two shape guards, the integer regex, the double probe), and
    * an inline `try_cast(variant → string)` re-decodes the variant per
    * reference.
    */
  private def labelFromParts(
      vv: Column, s: Column, sniffNumericStrings: Boolean): Column = {
    // Physical-type dispatch via the O(1) header-byte tag, NOT
    // schema_of_variant: the latter renders a type STRING per value
    // (recursively merging the whole nested schema for object/array
    // values) and was referenced once per CaseWhen branch — the same
    // multiplier the round-13 transform work removed from T3, surfaced
    // here by the round-14 un-prunable bench (q12 read 8.2 s while the
    // old count() action was pruning the label evaluation entirely).
    // Tag mapping is label-equivalent: BOOLEAN→boolean, LONG→integer,
    // DECIMAL/DOUBLE→numeric, STRING→sniff, JSON-null→no vote,
    // object/array/other→text (they stringify in the reference).
    val tag = GraftExpressionBridge.column(
      graft.functions.VariantTypeTag(GraftExpressionBridge.expression(vv)))
    val stringLabel = {
      val base = when(
        s.contains(":") && firstMatch(s, datetimeFormats).isNotNull, "datetime")
        .when(s.rlike(dateShape) && firstMatch(s, dateOnlyFormats).isNotNull, "date")
      if (sniffNumericStrings)
        // int(s): integral strings only (DuckDB's try_cast would round,
        // so both engines sniff integers with this regex)
        base.when(s.rlike("^[+-]?[0-9]+$"), "integer")
          .when(s.try_cast("double").isNotNull, "numeric")
          .otherwise("text")
      else base.otherwise("text")
    }
    when(tag === graft.functions.VariantTypeTag.TagJsonNull,
      lit(null).cast("string"))
      .when(tag === graft.functions.VariantTypeTag.TagBoolean, "boolean")
      .when(tag === graft.functions.VariantTypeTag.TagLong, "integer")
      .when(tag === graft.functions.VariantTypeTag.TagDecimal
        || tag === graft.functions.VariantTypeTag.TagDouble, "numeric")
      .when(tag === graft.functions.VariantTypeTag.TagString, stringLabel)
      .otherwise("text") // lists/objects stringify to text in the reference
  }

  /** I2 resolution over the distinct observed labels. */
  def resolveVotes(votes: Column): Column =
    when(size(votes) === 0, "text")
      .when(size(votes) === 1, element_at(votes, 1))
      .when(size(filter(votes, v => !v.isin("integer", "numeric"))) === 0, "numeric")
      .otherwise("text")

  /** I1+I2+I3+I4 — infer the schema of a raw-JSON document DataFrame.
    * Returns (attribute, inferred_type, is_object_id), sorted by
    * attribute (the reference's `_collect_attributes` sorts).
    */
  def inferSchema(
      raw: DataFrame,
      rawCol: String,
      sniffNumericStrings: Boolean = true): DataFrame = {
    val exploded = raw
      .select(explode(parse_json(col(rawCol)).try_cast("map<string,variant>"))
        .as(Seq("attribute", "vv")))
      // stage the string rendering once per value (see labelFromParts)
      .select(col("attribute"), col("vv"),
        col("vv").try_cast("string").as("__s"))
    val votes = exploded
      .groupBy("attribute")
      .agg(array_sort(collect_set(
        labelFromParts(col("vv"), col("__s"), sniffNumericStrings))).as("votes"))
      .select(col("attribute"), resolveVotes(col("votes")).as("inferred_type"))
    // I4: _id > id > first (alphabetically first = the sorted head).
    val chosen = votes.agg(
      coalesce(
        max(when(col("attribute") === "_id", "_id")),
        max(when(col("attribute") === "id", "id")),
        min(col("attribute"))).as("__chosen"))
    votes
      .crossJoin(broadcast(chosen))
      .select(
        col("attribute"),
        col("inferred_type"),
        (col("attribute") === col("__chosen")).as("is_object_id"))
      .orderBy("attribute")
  }

  /** [[inferSchema]] over a deterministic hash sample of the documents
    * — the 100 TB path (SCALING.md documents full-scan inference as a
    * deliberate reference-parity choice, with sampling as the
    * divergence-if-enabled). The sample is content-stable (salted
    * md5-prefix bucket of the raw document, like
    * `graft.llm.Curation.splitBucket`), so repeated runs over the same
    * corpus infer from the same documents — no `TABLESAMPLE`
    * partition-order dependence. `pct` in (0,100]; type votes remain a
    * UNION over sampled docs, so any type present in the sample still
    * wins exactly as in the full scan.
    */
  def inferSchemaSampled(
      raw: DataFrame,
      rawCol: String,
      pct: Int,
      sniffNumericStrings: Boolean = true): DataFrame = {
    require(pct > 0 && pct <= 100, s"pct must be in (0,100], got $pct")
    val sampled = raw.filter(
      pmod(graft.llm.TextHash.hash60(concat(lit("infer:"), col(rawCol))),
        lit(100L)) < pct)
    inferSchema(sampled, rawCol, sniffNumericStrings)
  }

  /** `_build_mapping_config` (`run_pipeline.py:240-258`): turn an
    * inferred schema into a placeholder CollectionMapping (identity
    * column names, inferred types, `<schema>.<collection>` target).
    */
  def inferMapping(
      raw: DataFrame,
      rawCol: String,
      collectionName: String,
      targetSchema: String = "public"): CollectionMapping = {
    val rows = inferSchema(raw, rawCol).collect()
    val attrs = rows.map(r => r.getString(0) -> r.getString(1))
    val objectId = rows.find(_.getBoolean(2)).map(_.getString(0)).getOrElse("id")
    CollectionMapping(
      targetTable = s"$targetSchema.$collectionName",
      rawJsonColumn = "raw_json",
      objectIdAttribute = objectId,
      mappings = ListMap(attrs.map { case (a, t) => a -> AttributeMapping(a, t) }: _*))
  }
}
