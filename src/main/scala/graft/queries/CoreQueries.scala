package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.AuditAnalytics._

/** SURVEY §2.10 core query set Q1–Q10: the reference's audit-analytics
  * surface (aggregations, pivot, explode, joins, set ops, sorts) mapped
  * onto the driver's fixture tables exactly as FIXTURES.md §B assigns
  * roles (`events` plays `ingestion_audit`, `o_orderstatus` plays
  * `processing_status`, ...).
  */
object CoreQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q1 (A1,F2): filtered count on the latest ingestion date.
    // Reference: ui/run_pipeline.py:436-450.
    "q01_count_latest_date" -> QuerySpec(
      (s, dir) => countOnLatestDate(Tables.events(s, dir), col("ts")),
      """SELECT count(*) AS cnt FROM events
         WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)"""),

    // Q2 (A2): MAX over date cast. Reference: ui/run_pipeline.py:453-469.
    "q02_max_date" -> QuerySpec(
      (s, dir) => maxDate(Tables.events(s, dir), col("ts")),
      "SELECT max(CAST(ts AS DATE)) AS max_date FROM events"),

    // Q3 (A3,F3): 2-key group-by + conditional FILTER count + IS NOT NULL.
    // Reference: repositories/postgres_audit_repository.py:72-84.
    "q03_group_conditional" -> QuerySpec(
      (s, dir) =>
        groupedConditionalCount(
          Tables.events(s, dir), col("ts"), col("event_type"), col("value") > 100)
          .orderBy("ingestion_date", "group_key"),
      """SELECT CAST(ts AS DATE) AS ingestion_date, event_type AS group_key,
                count(*) AS total_docs,
                count(*) FILTER (WHERE value > 100) AS flagged_docs
         FROM events WHERE event_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q4 (A4,O5): pivot (crosstab) counts, zero-filled, sorted. Pivot
    // values pinned — single scan. Reference: ui/audit_dashboard.py:106-113.
    "q04_pivot_status" -> QuerySpec(
      (s, dir) =>
        pivotCounts(Tables.orders(s, dir), "o_orderpriority", "o_orderstatus",
          Seq("F", "O", "P"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
                count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
                count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY 1 ORDER BY 1"""),

    // Q5 (A5,O3): explode array → frequency count → sort desc.
    // Reference: ui/audit_dashboard.py:178-192.
    "q05_explode_freq" -> QuerySpec(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("word")),
      """SELECT w AS word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> '' GROUP BY 1 ORDER BY cnt DESC, word"""),

    // Q6 (A6,F4): KPI scalar counts in one aggregation pass.
    // Reference: ui/audit_dashboard.py:54-65.
    "q06_kpi_counts" -> QuerySpec(
      (s, dir) =>
        kpiCounts(Tables.documents(s, dir),
          col("lang") === "en", col("n_chars") > 500),
      """SELECT count(*) AS total_docs,
                count(*) FILTER (WHERE lang = 'en') AS success_docs,
                count(*) FILTER (WHERE n_chars > 500) AS flagged_docs
         FROM documents"""),

    // Q7 (A7,J3,A10): coverage partition via semi/anti joins.
    // Reference: ui/audit_dashboard.py:74-87, etl_pipeline/pipeline.py:57-65.
    "q07_coverage_anti" -> QuerySpec(
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val sup = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("n_nationkey"))
        coverage(n, sup, "n_nationkey")
      },
      """SELECT 'covered' AS part, count(*) AS cnt FROM nation
         WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT 'missing' AS part, count(*) AS cnt FROM nation
         WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
         ORDER BY part"""),

    // Q8 (J1,O2): full-outer 2-key join of two aggregates + zero fill +
    // mixed-direction nulls-last sort.
    // Reference: repositories/postgres_audit_repository.py:91-108.
    "q08_full_outer_agg" -> QuerySpec(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val a = o.filter(col("o_orderstatus") === "F")
          .groupBy(to_date(col("o_orderdate")).as("d"), col("o_orderpriority"))
          .agg(count(lit(1)).as("f_cnt"))
        val b = o.filter(col("o_orderstatus") === "O")
          .groupBy(to_date(col("o_orderdate")).as("d"), col("o_orderpriority"))
          .agg(count(lit(1)).as("o_cnt"))
        fullOuterCounts(a, b, Seq("d", "o_orderpriority"),
          Seq("f_cnt", "o_cnt"), "d", "o_orderpriority")
      },
      """WITH a AS (
           SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority, count(*) AS f_cnt
           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2),
         b AS (
           SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority, count(*) AS o_cnt
           FROM orders WHERE o_orderstatus = 'O' GROUP BY 1, 2)
         SELECT COALESCE(a.d, b.d) AS d,
                COALESCE(a.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
                COALESCE(f_cnt, 0) AS f_cnt, COALESCE(o_cnt, 0) AS o_cnt
         FROM a FULL OUTER JOIN b
           ON a.d = b.d AND a.o_orderpriority = b.o_orderpriority
         ORDER BY d DESC NULLS LAST, o_orderpriority"""),

    // Q9 (J2): broadcast lookup remap with coalesce fallback + distinct.
    // Reference: repositories/postgres_audit_repository.py:40-70.
    "q09_lookup_remap" -> QuerySpec(
      (s, dir) =>
        lookupRemap(
          Tables.supplier(s, dir), Tables.nation(s, dir),
          "s_nationkey", "n_nationkey", "n_name",
          concat(lit("nation_"), col("s_nationkey")))
          .orderBy("s_nationkey", "collection_name"),
      """SELECT DISTINCT s_nationkey,
                COALESCE(n_name, 'nation_' || s_nationkey) AS collection_name
         FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
         ORDER BY s_nationkey, collection_name"""),

    // Q10 (A8): per-group run counters incl. greatest(processed-errors,0).
    // Reference: etl_pipeline/reporting.py:19-41.
    "q10_run_counters" -> QuerySpec(
      (s, dir) =>
        runCounters(Tables.lineitem(s, dir), col("l_returnflag"),
          col("l_quantity") > 45, col("l_discount") > 0.09)
          .orderBy("collection"),
      """SELECT l_returnflag AS collection,
                count(*) AS processed,
                count(*) FILTER (WHERE l_quantity > 45) AS errors,
                count(*) FILTER (WHERE l_discount > 0.09) AS insert_failures,
                greatest(count(*) - count(*) FILTER (WHERE l_quantity > 45), 0) AS successful
         FROM lineitem GROUP BY 1 ORDER BY 1""")
  )
}
