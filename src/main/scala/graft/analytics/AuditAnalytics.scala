package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's audit-analytics query surface (SURVEY §2.5–§2.8),
  * re-expressed as reusable DataFrame combinators.
  *
  * Reference behaviors reproduced (citations are reference file:line):
  *  - A1 filtered count            `ui/run_pipeline.py:436-450`
  *  - A2 max over date cast        `ui/run_pipeline.py:453-469`
  *  - A3 group-by + FILTER count   `repositories/postgres_audit_repository.py:72-84`
  *  - A4 pivot (crosstab) counts   `ui/audit_dashboard.py:106-113`
  *  - A5 explode + frequency       `ui/audit_dashboard.py:178-192`
  *  - A6 KPI scalar counts         `ui/audit_dashboard.py:54-65`
  *  - A7 distinct set              `ui/audit_dashboard.py:67-75`
  *  - A8 per-group run counters    `etl_pipeline/reporting.py:19-41`
  *  - A10 coverage partition       `ui/audit_dashboard.py:74-87`
  *  - J1 full-outer 2-key join     `repositories/postgres_audit_repository.py:91-102`
  *  - J2 lookup remap w/ fallback  `repositories/postgres_audit_repository.py:40-70`
  *  - J3 set difference (anti)     `etl_pipeline/pipeline.py:57-65`
  *
  * Scale notes: every combinator is a declarative plan — aggregations get
  * map-side partial aggregation from Catalyst, pivots use pinned value
  * lists (no extra distinct scan), lookup joins take an explicit
  * broadcast hint, and nothing collects to the driver.
  */
object AuditAnalytics {

  /** A1: COUNT(*) rows whose `tsCol` falls on `date`. */
  def countOnDate(df: DataFrame, tsCol: Column, date: Column): DataFrame =
    df.filter(to_date(tsCol) === date).agg(count(lit(1)).as("cnt"))

  /** A1 variant used by the fixtures: count on the latest ingestion date.
    * Single pass over the fact table: per-date partial counts (map-side
    * combined), then a tiny all-to-one top-1 — no second scan, no driver
    * round-trip. At 100 TB the post-aggregate is one row per distinct
    * date, so the `limit(1)` sort is negligible.
    */
  def countOnLatestDate(df: DataFrame, tsCol: Column): DataFrame =
    df.groupBy(to_date(tsCol).as("d"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("d"))
      .limit(1)
      .select("cnt")

  /** A2: MAX(ts::date) — latest run date. */
  def maxDate(df: DataFrame, tsCol: Column): DataFrame =
    df.agg(max(to_date(tsCol)).as("max_date"))

  /** A3: per (date, group) counts plus a conditional count, with the
    * group key filtered non-null (`WHERE source_collection IS NOT NULL`
    * + `COUNT(*) FILTER (WHERE ...)` in the reference SQL).
    */
  def groupedConditionalCount(
      df: DataFrame,
      tsCol: Column,
      groupCol: Column,
      condition: Column): DataFrame =
    df.filter(groupCol.isNotNull)
      .groupBy(to_date(tsCol).as("ingestion_date"), groupCol.as("group_key"))
      .agg(
        count(lit(1)).as("total_docs"),
        count(when(condition, 1)).as("flagged_docs"))

  /** A4: pivot counts of `statusCol` per `keyCol`, zero-filled. Pivot
    * values are pinned by the caller so the plan is a single pass (Spark
    * otherwise runs an extra distinct scan to discover them).
    */
  def pivotCounts(
      df: DataFrame,
      keyCol: String,
      statusCol: String,
      statuses: Seq[String]): DataFrame =
    df.groupBy(col(keyCol))
      .pivot(statusCol, statuses)
      .agg(count(lit(1)))
      .na.fill(0, statuses)

  /** A4 discovery overload, drop-in for the reference's `pivot_table`
    * semantics when statuses aren't known a priori
    * (`ui/audit_dashboard.py:106-113`): one tiny distinct scan collects
    * the status values to the driver (they are a handful by definition —
    * this is the same plan Spark's own value-less `pivot` runs), then the
    * pinned single-pass pivot. Prefer [[pivotCounts]] with pinned values
    * when the caller knows them.
    */
  def pivotCountsDynamic(df: DataFrame, keyCol: String, statusCol: String): DataFrame = {
    val statuses = df
      .filter(col(statusCol).isNotNull)
      .select(col(statusCol).cast("string"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
      .toSeq
    pivotCounts(df, keyCol, statusCol, statuses)
  }

  /** A5: explode an array column and count value frequencies, descending.
    * The reference drops null arrays first (`dropna`,
    * `ui/audit_dashboard.py:179`) — expressed as a null filter on the
    * column itself, which works for qualified/computed columns too.
    */
  def explodeFrequency(df: DataFrame, arrayCol: Column): DataFrame =
    df.filter(arrayCol.isNotNull)
      .select(explode(arrayCol).as("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("item"))

  /** A6: KPI scalars — total rows, rows matching `successCond`, rows
    * matching `missingCond` — one aggregation pass.
    */
  def kpiCounts(df: DataFrame, successCond: Column, missingCond: Column): DataFrame =
    df.agg(
      count(lit(1)).as("total_docs"),
      count(when(successCond, 1)).as("success_docs"),
      count(when(missingCond, 1)).as("flagged_docs"))

  /** A7: distinct non-null values of a column. */
  def distinctSet(df: DataFrame, c: Column): DataFrame =
    df.filter(c.isNotNull).select(c.as("value")).distinct()

  /** A10 + J3: coverage partition — how many `expected` keys appear in
    * `actual` (semi) vs not (anti). Two tiny aggregates unioned.
    */
  def coverage(expected: DataFrame, actual: DataFrame, key: String): DataFrame = {
    val covered = expected
      .join(actual, Seq(key), "left_semi")
      .agg(count(lit(1)).as("cnt"))
      .select(lit("covered").as("part"), col("cnt"))
    val missing = expected
      .join(actual, Seq(key), "left_anti")
      .agg(count(lit(1)).as("cnt"))
      .select(lit("missing").as("part"), col("cnt"))
    covered.unionByName(missing).orderBy("part")
  }

  /** A8: per-collection run counters — processed / errors / insert
    * failures / `successful = greatest(processed - errors, 0)`.
    *
    * Matches `reporting.py:19-25` exactly: `record_document` returns
    * early on insert failure, so an insert-failed document is counted
    * ONLY under `insert_failures` — it is excluded from both `processed`
    * and `errors` even if it also had transform errors.
    */
  def runCounters(
      df: DataFrame,
      collectionCol: Column,
      errorCond: Column,
      insertFailureCond: Column): DataFrame =
    df.groupBy(collectionCol.as("collection"))
      .agg(
        count(when(!insertFailureCond, 1)).as("processed"),
        count(when(!insertFailureCond && errorCond, 1)).as("errors"),
        count(when(insertFailureCond, 1)).as("insert_failures"))
      .withColumn("successful", greatest(col("processed") - col("errors"), lit(0L)))

  /** A9: per-object set-union of missing-column names plus the count of
    * docs with any missing (`reporting.py:30-34`). `array_sort` pins the
    * element order so output is deterministic.
    */
  def missingColumnsUnion(
      df: DataFrame,
      objectCol: Column,
      missingCol: Column): DataFrame =
    df.groupBy(objectCol.as("object_name"))
      .agg(
        array_sort(array_distinct(flatten(collect_list(missingCol))))
          .as("missing_columns"),
        count(when(size(missingCol) > 0, 1)).as("docs_with_missing"))

  /** J1: full-outer join of two aggregates on shared keys, missing counts
    * zero-filled, sorted date-desc-nulls-last then key-asc (reference
    * `sort_values([date desc, collection asc], na_position="last")`).
    */
  def fullOuterCounts(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      fillCols: Seq[String],
      sortDesc: String,
      sortAsc: String): DataFrame =
    left.join(right, keys, "full_outer")
      .na.fill(0, fillCols)
      .orderBy(desc_nulls_last(sortDesc), asc_nulls_last(sortAsc))

  /** J2: dimension-lookup remap with fallback — broadcast join against a
    * small lookup table, unmapped keys fall back to a derived name, then
    * distinct. The lookup side carries an explicit broadcast hint: at
    * 100 TB the fact side never shuffles for this join.
    */
  def lookupRemap(
      fact: DataFrame,
      lookup: DataFrame,
      factKey: String,
      lookupKey: String,
      lookupName: String,
      fallback: Column): DataFrame =
    fact.join(broadcast(lookup), fact(factKey) === lookup(lookupKey), "left")
      .select(
        fact(factKey),
        coalesce(col(lookupName), fallback).as("collection_name"))
      .distinct()
}
