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
      """SELECT 'covered' AS part, count(*) AS cnt FROM nation n
         WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
         UNION ALL
         SELECT 'missing' AS part, count(*) AS cnt FROM nation n
         WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
         ORDER BY part"""),

    // Q8 (O2): per-(date, priority) status counts as ONE scan with
    // conditional aggregates — both "sides" derive from the same source,
    // so the round-1 full-outer-join-of-two-aggregates plan was 2× scan
    // + a shuffle join for nothing (round-2 verdict). The genuine
    // two-source full-outer J1 operator now lives in q18.
    // Reference: repositories/postgres_audit_repository.py:91-108.
    "q08_full_outer_agg" -> QuerySpec(
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_orderstatus").isin("F", "O"))
          .groupBy(to_date(col("o_orderdate")).as("d"), col("o_orderpriority"))
          .agg(
            count(when(col("o_orderstatus") === "F", 1)).as("f_cnt"),
            count(when(col("o_orderstatus") === "O", 1)).as("o_cnt"))
          .orderBy(desc_nulls_last("d"), asc_nulls_last("o_orderpriority")),
      """SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
                count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt
         FROM orders WHERE o_orderstatus IN ('F', 'O')
         GROUP BY 1, 2
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
                count(*) FILTER (WHERE NOT l_discount > 0.09) AS processed,
                count(*) FILTER (WHERE NOT l_discount > 0.09 AND l_quantity > 45) AS errors,
                count(*) FILTER (WHERE l_discount > 0.09) AS insert_failures,
                greatest(count(*) FILTER (WHERE NOT l_discount > 0.09)
                         - count(*) FILTER (WHERE NOT l_discount > 0.09 AND l_quantity > 45), 0) AS successful
         FROM lineitem GROUP BY 1 ORDER BY 1"""),

    // Q19 (A4 dynamic): pivot with runtime status discovery — the
    // reference's pivot_table discovers columns from the data
    // (ui/audit_dashboard.py:106-113). Discovery is a tiny distinct
    // scan collected to the driver, then the same single-pass pinned
    // pivot as q04. (Also closes the q19 numbering gap noted in r03.)
    "q19_pivot_dynamic" -> QuerySpec(
      (s, dir) =>
        pivotCountsDynamic(Tables.orders(s, dir), "o_orderpriority", "o_orderstatus")
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
                count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
                count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY 1 ORDER BY 1"""),

    // Q13 (A5,F4): explode a REAL array column (with null arrays dropped)
    // → frequency → sort desc. Closes the round-2 gap where A5 was only
    // tested via an inline string split and `size(arr)` never on an
    // array. Reference: ui/audit_dashboard.py:178-192.
    "q13_explode_freq_array" -> QuerySpec(
      (s, dir) =>
        explodeFrequency(
          Tables.documents(s, dir).withColumn(
            "mc",
            when(col("doc_id") % 10 === 0, lit(null))
              .otherwise(slice(split(col("text"), " "), 1, 5))),
          col("mc")),
      """SELECT item, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')[1:5]) AS item
               FROM documents WHERE doc_id % 10 <> 0)
         GROUP BY 1 ORDER BY cnt DESC, item"""),

    // Q14 (A9): per-object set-union of missing columns + count of docs
    // with any missing. The operator keeps its array<string> output;
    // the GATE serializes it with to_json on both sides because the
    // driver's pandas comparator cannot sort array cells
    // (CORRECTNESS_r03 q14 `unhashable type: numpy.ndarray`).
    // Reference: etl_pipeline/reporting.py:30-34.
    "q14_missing_union" -> QuerySpec(
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn(
            "mc",
            when(col("doc_id") % 10 === 0, lit(null))
              .otherwise(slice(split(col("text"), " "), 1, 3)))
          .transform(d => missingColumnsUnion(d, col("source"), col("mc")))
          .withColumn("missing_columns", to_json(col("missing_columns")))
          .orderBy("object_name"),
      """SELECT source AS object_name,
                CAST(to_json(list_sort(list_distinct(
                  COALESCE(flatten(list(mc) FILTER (WHERE mc IS NOT NULL)),
                           CAST([] AS VARCHAR[]))))) AS VARCHAR) AS missing_columns,
                count(*) FILTER (WHERE len(mc) > 0) AS docs_with_missing
         FROM (SELECT source,
                      CASE WHEN doc_id % 10 = 0 THEN NULL
                           ELSE string_split(text, ' ')[1:3] END AS mc
               FROM documents)
         GROUP BY 1 ORDER BY 1"""),

    // Q15 (J4): key-presence classification — input "collections" with no
    // mapping-config entry, via broadcast anti join against the (tiny)
    // config-key set. Reference: etl_pipeline/pipeline.py:128-137.
    "q15_unmapped_classification" -> QuerySpec(
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val mapped = Seq("AUTOMOBILE", "BUILDING", "MACHINERY").toDF("collection")
        Tables.customer(s, dir)
          .select(col("c_mktsegment").as("collection"))
          .distinct()
          .join(broadcast(mapped), Seq("collection"), "left_anti")
          .orderBy("collection")
      },
      """SELECT DISTINCT c_mktsegment AS collection FROM customer
         WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
         ORDER BY 1"""),

    // Q16 (O1,O4): newest-first scan + LIMIT 1 preview, deterministic
    // tiebreak. Reference: ui/mapping_editor.py:391-409,
    // repositories/postgres_audit_repository.py:34.
    "q16_limit1_preview" -> QuerySpec(
      (s, dir) =>
        Tables.events(s, dir)
          .orderBy(desc("ts"), desc("event_id"))
          .limit(1)
          .select(col("event_id"), col("event_type")),
      """SELECT event_id, event_type FROM events
         ORDER BY ts DESC, event_id DESC LIMIT 1"""),

    // Q17 (A7): distinct non-null value set. Reference:
    // ui/audit_dashboard.py:67-75.
    "q17_distinct_set" -> QuerySpec(
      (s, dir) =>
        distinctSet(Tables.events(s, dir), col("event_type")).orderBy("value"),
      """SELECT DISTINCT event_type AS value FROM events
         WHERE event_type IS NOT NULL ORDER BY 1"""),

    // Q18 (J1,O2): the genuine two-source full-outer 2-key join —
    // order counts vs lineitem counts per (date, status letter), missing
    // sides zero-filled, date desc nulls last + status asc nulls last.
    // Reference: repositories/postgres_audit_repository.py:91-108.
    "q18_full_outer_two_sources" -> QuerySpec(
      (s, dir) => {
        val a = Tables.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("d"),
            col("o_orderstatus").as("status"))
          .agg(count(lit(1)).as("order_cnt"))
        val b = Tables.lineitem(s, dir)
          .groupBy(to_date(col("l_shipdate")).as("d"),
            col("l_linestatus").as("status"))
          .agg(count(lit(1)).as("line_cnt"))
        fullOuterCounts(a, b, Seq("d", "status"),
          Seq("order_cnt", "line_cnt"), "d", "status")
      },
      """WITH a AS (
           SELECT CAST(o_orderdate AS DATE) AS d, o_orderstatus AS status,
                  count(*) AS order_cnt
           FROM orders GROUP BY 1, 2),
         b AS (
           SELECT CAST(l_shipdate AS DATE) AS d, l_linestatus AS status,
                  count(*) AS line_cnt
           FROM lineitem GROUP BY 1, 2)
         SELECT COALESCE(a.d, b.d) AS d,
                COALESCE(a.status, b.status) AS status,
                COALESCE(order_cnt, 0) AS order_cnt,
                COALESCE(line_cnt, 0) AS line_cnt
         FROM a FULL OUTER JOIN b ON a.d = b.d AND a.status = b.status
         ORDER BY d DESC NULLS LAST, status ASC NULLS LAST""")
  )
}
