package graft.queries

import org.apache.spark.sql.functions._
import graft.{CacheScope, Tables}
import graft.analytics.{BottomKSample, DistributedOrder}
import graft.llm.TextHash

/** Round-10 session-3 fit/apply and evaluation-protocol surface: the
  * train-fitted-transform-applied-to-test contract (q248), the
  * watermark-sizing lateness profile (q249), and k-fold
  * cross-validation rollups (q250).
  */
object FitEvalQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q248: fit-on-train / apply-to-test binning — the preprocessing
    // contract every ML pipeline must honor (bin edges learned ONLY
    // from the train split, then applied unchanged to test — fitting
    // on test is leakage). Train/test is the repo's deterministic
    // md5-hash split; edges are exact nearest-rank quantiles of the
    // train values via [[BottomKSample.exactQuantiles]] (distributed
    // cumulative counts, no corpus window); application is a
    // broadcast of the 4-row edge relation — each test row's bin is
    // `Σ 1[v ≥ edge]`, computed inside one aggregate. The emitted
    // per-bin extrema make a leak visible: test values beyond the
    // train edges land in the outer bins instead of moving the edges.
    "q248_fit_apply_binning" -> QuerySpec(
      (s, dir) => {
        val data = CacheScope.persist(
          Tables.lineitem(s, dir).select(
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
            TextHash.hash60(concat_ws("|",
              col("l_orderkey").cast("string"),
              col("l_linenumber").cast("string"))).as("h")))
        val train = data.filter(col("h") % 10 < 8)
        val test = data.filter(col("h") % 10 >= 8)
        val edges = BottomKSample
          .exactQuantiles(train, col("v"), Seq(20, 40, 60, 80))
          .select(col("exact").as("edge"))
        test.crossJoin(broadcast(edges))
          .groupBy("h", "v")
          .agg(sum(when(col("v") >= col("edge"), 1L).otherwise(0L))
            .cast("long").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            min("v").cast("long").as("min_cents"),
            max("v").cast("long").as("max_cents"))
          .orderBy("bin")
      },
      s"""WITH data AS (SELECT
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
               ${OracleIdioms.hex60(
                 "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)")}
                 AS h
             FROM lineitem),
         train AS (SELECT v FROM data WHERE h % 10 < 8),
         test AS (SELECT h, v FROM data WHERE h % 10 >= 8),
         vals AS (SELECT v, CAST(count(*) AS BIGINT) AS c
                  FROM train GROUP BY 1),
         cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vals),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
         qs(q_pct) AS (VALUES (CAST(20 AS BIGINT)), (40), (60), (80)),
         edges AS (SELECT q_pct, min(v) AS edge
                   FROM cum, qs, n
                   WHERE cum >= ((n - 1) * q_pct) // 100 + 1
                   GROUP BY 1),
         per AS (SELECT h, v,
                        CAST(sum(CASE WHEN v >= edge THEN 1 ELSE 0 END)
                             AS BIGINT) AS bin
                 FROM test CROSS JOIN edges GROUP BY 1, 2)
         SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(min(v) AS BIGINT) AS min_cents,
                CAST(max(v) AS BIGINT) AS max_cents
         FROM per GROUP BY 1 ORDER BY 1"""),

    // Q249: event-time lateness profile — the operator that SIZES a
    // streaming watermark instead of guessing it: each event's
    // lateness is the running max of event time over ARRIVAL order
    // minus its own event time; the band histogram says what fraction
    // of events a 1min/10min/1h watermark would drop. The fixture's
    // events ship in perfect event-time order (zero lateness — a
    // profile no real ingest ever shows), so arrival is modeled as
    // event time plus a deterministic md5 transport jitter of up to
    // 2 minutes — the bounded out-of-orderness shape real
    // multi-producer ingestion has. The running max over the full
    // arrival order uses the new [[DistributedOrder.withRunningMax]]
    // — range-partitioned two-level, no single-partition window over
    // the corpus (the q197/q198/q209 rule).
    "q249_lateness_profile" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("arrival_us",
            col("ts_us") + pmod(
              TextHash.hash60(col("event_id").cast("string")),
              lit(120000000L)))
        val rm = DistributedOrder.withRunningMax(
          ev, Seq(col("arrival_us"), col("event_id")), col("ts_us"), "rm")
        val banded = rm
          .withColumn("late_us", col("rm") - col("ts_us"))
          .withColumn("band",
            when(col("late_us") === 0, "b0_ontime")
              .when(col("late_us") <= 60000000L, "b1_under_1min")
              .when(col("late_us") <= 600000000L, "b2_under_10min")
              .when(col("late_us") <= 3600000000L, "b3_under_1h")
              .otherwise("b4_over_1h"))
        val total = ev.agg(count(lit(1)).cast("long").as("n_total"))
        banded.groupBy("band")
          .agg(count(lit(1)).cast("long").as("n_events"),
            max("late_us").cast("long").as("max_late_us"))
          .crossJoin(broadcast(total))
          .select(col("band"), col("n_events"), col("max_late_us"),
            expr("(n_events * 1000000) div n_total").as("share_ppm"))
          .orderBy("band")
      },
      s"""WITH e0 AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
         e AS (SELECT event_id, ts_us,
                      ts_us + ${OracleIdioms.hex60(
                        "CAST(event_id AS VARCHAR)")} % 120000000
                        AS arrival_us
               FROM e0),
         m AS (SELECT ts_us,
                      max(ts_us) OVER (ORDER BY arrival_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS rm
               FROM e),
         b AS (SELECT rm - ts_us AS late_us,
                      CASE WHEN rm - ts_us = 0 THEN 'b0_ontime'
                           WHEN rm - ts_us <= 60000000 THEN 'b1_under_1min'
                           WHEN rm - ts_us <= 600000000 THEN 'b2_under_10min'
                           WHEN rm - ts_us <= 3600000000 THEN 'b3_under_1h'
                           ELSE 'b4_over_1h' END AS band
               FROM m),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM e)
         SELECT band, CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(late_us) AS BIGINT) AS max_late_us,
                CAST((count(*) * 1000000) // n_total AS BIGINT) AS share_ppm
         FROM b, t GROUP BY band, n_total ORDER BY band"""),

    // Q250: k-fold cross-validation — the evaluation PROTOCOL around
    // the q224 metric family: deterministic fold assignment
    // (doc_id mod 5), one (fold, truth, pred) rollup, per-fold
    // accuracy in exact ppm, and a summary row (-1) carrying the
    // fold-mean and fold-variance of accuracy — variance via the
    // integral k·Σx²−(Σx)² form, no float moments. One scan, one
    // 5-row second-tier aggregate; the fold axis never re-reads data.
    "q250_kfold_eval" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q250_documents")
        s.sql("""
          WITH d AS (SELECT doc_id,
                            (instr('de en es fr zh', lang) + 2) div 3 - 1
                              AS ti
                     FROM g_q250_documents),
          p AS (SELECT doc_id % 5 AS fold, ti,
                       CASE WHEN doc_id % 10 < 7 THEN ti
                            ELSE (ti + 1 + doc_id % 3) % 5 END AS pi
                FROM d),
          f AS (SELECT fold, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN pi = ti THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_correct
                FROM p GROUP BY 1),
          m AS (SELECT CAST(fold AS BIGINT) AS fold, n, n_correct,
                       (n_correct * 1000000) div n AS acc_ppm,
                       CAST(0 AS BIGINT) AS var_ppm2
                FROM f),
          sm AS (SELECT CAST(-1 AS BIGINT) AS fold,
                        CAST(sum(n) AS BIGINT) AS n,
                        CAST(sum(n_correct) AS BIGINT) AS n_correct,
                        CAST(sum(acc_ppm) div 5 AS BIGINT) AS acc_ppm,
                        CAST((5 * sum(acc_ppm * acc_ppm)
                              - sum(acc_ppm) * sum(acc_ppm)) div 25
                             AS BIGINT) AS var_ppm2
                 FROM m)
          SELECT * FROM m UNION ALL SELECT * FROM sm ORDER BY fold""")
      },
      """WITH d AS (SELECT doc_id,
                           (strpos('de en es fr zh', lang) + 2) // 3 - 1
                             AS ti
                    FROM documents),
         p AS (SELECT doc_id % 5 AS fold, ti,
                      CASE WHEN doc_id % 10 < 7 THEN ti
                           ELSE (ti + 1 + doc_id % 3) % 5 END AS pi
               FROM d),
         f AS (SELECT fold, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN pi = ti THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_correct
               FROM p GROUP BY 1),
         m AS (SELECT CAST(fold AS BIGINT) AS fold, n, n_correct,
                      (n_correct * 1000000) // n AS acc_ppm,
                      CAST(0 AS BIGINT) AS var_ppm2
               FROM f),
         sm AS (SELECT CAST(-1 AS BIGINT) AS fold,
                       CAST(sum(n) AS BIGINT) AS n,
                       CAST(sum(n_correct) AS BIGINT) AS n_correct,
                       CAST(sum(acc_ppm) // 5 AS BIGINT) AS acc_ppm,
                       CAST((5 * sum(acc_ppm * acc_ppm)
                             - sum(acc_ppm) * sum(acc_ppm)) // 25
                            AS BIGINT) AS var_ppm2
                FROM m)
         SELECT fold, n, n_correct, CAST(acc_ppm AS BIGINT) AS acc_ppm,
                var_ppm2
         FROM (SELECT * FROM m UNION ALL SELECT * FROM sm)
         ORDER BY fold"""),

    // Q255: Theil–Sen robust trend — the median of all pairwise
    // slopes of monthly revenue per region, the outlier-immune
    // replacement for OLS slope (one wild month can't move it).
    // Integer contract: slopes are quantized
    // sign(Δy)·(|Δy|·10⁶ div Δm) — the abs/sign split matters because
    // integer division of NEGATIVES diverges between engines (Spark
    // `div` truncates toward zero, DuckDB `//` floors); on
    // non-negative operands they agree, so the sign is applied after.
    // The lower median is rank (n+1) div 2 of (slope, m1, m2) — a
    // total order. Scale shape: the time axis is bounded (80 months),
    // so the per-group pair matrix is a few thousand rows per region
    // — quadratic in MONTHS, never in source rows, which all collapse
    // into the monthly rollup first.
    "q255_theil_sen" -> QuerySpec(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .createOrReplaceTempView("g_q255_joined")
        // pts feeds THREE consumers (both sides of the pair self-join
        // and the correlated n_months count); inlined, the fact join +
        // monthly rollup ran three times — 12 source scans (§2.4
        // shared-subtree rule). Persist the tiny (region × month)
        // rollup once; the self-join and count read the cache.
        graft.CacheScope.persist(s.sql("""
          SELECT r_name,
                 (year(o_orderdate) - 1995) * 12
                   + month(o_orderdate) - 1 AS m,
                 CAST(sum(CAST(round(o_totalprice * 100)
                               AS BIGINT)) AS BIGINT) AS y
          FROM g_q255_joined GROUP BY 1, 2"""))
          .createOrReplaceTempView("g_q255_pts")
        s.sql("""
          WITH pts AS (SELECT r_name, m, y FROM g_q255_pts),
          pr AS (SELECT a.r_name, a.m AS m1, b.m AS m2,
                        CASE WHEN b.y >= a.y THEN 1 ELSE -1 END
                          * CAST((CAST(abs(b.y - a.y) AS DECIMAL(38,0))
                                  * 1000000) div (b.m - a.m) AS BIGINT)
                          AS slope_ppm
                 FROM pts a JOIN pts b
                   ON a.r_name = b.r_name AND a.m < b.m),
          rk AS (SELECT r_name, slope_ppm,
                        row_number() OVER (PARTITION BY r_name
                          ORDER BY slope_ppm, m1, m2) AS rn,
                        count(*) OVER (PARTITION BY r_name) AS cnt
                 FROM pr)
          SELECT r_name,
                 CAST((SELECT count(*) FROM pts p
                       WHERE p.r_name = rk.r_name) AS BIGINT) AS n_months,
                 CAST(cnt AS BIGINT) AS n_pairs,
                 CAST(slope_ppm AS BIGINT) AS median_slope_ppm
          FROM rk WHERE rn = (cnt + 1) div 2
          ORDER BY r_name""")
      },
      """WITH j AS (SELECT r.r_name, o.o_orderdate, o.o_totalprice
                    FROM orders o
                    JOIN customer c ON o.o_custkey = c.c_custkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey),
         pts AS (SELECT r_name,
                        (year(o_orderdate) - 1995) * 12
                          + month(o_orderdate) - 1 AS m,
                        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS y
                 FROM j GROUP BY 1, 2),
         pr AS (SELECT a.r_name, a.m AS m1, b.m AS m2,
                       CASE WHEN b.y >= a.y THEN 1 ELSE -1 END
                         * CAST((CAST(abs(b.y - a.y) AS HUGEINT)
                                 * 1000000) // (b.m - a.m) AS BIGINT)
                         AS slope_ppm
                FROM pts a JOIN pts b
                  ON a.r_name = b.r_name AND a.m < b.m),
         rk AS (SELECT r_name, slope_ppm,
                       row_number() OVER (PARTITION BY r_name
                         ORDER BY slope_ppm, m1, m2) AS rn,
                       count(*) OVER (PARTITION BY r_name) AS cnt
                FROM pr),
         nm AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n_months
                FROM pts GROUP BY 1)
         SELECT rk.r_name, nm.n_months, CAST(cnt AS BIGINT) AS n_pairs,
                CAST(slope_ppm AS BIGINT) AS median_slope_ppm
         FROM rk JOIN nm ON nm.r_name = rk.r_name
         WHERE rn = (cnt + 1) // 2
         ORDER BY rk.r_name"""))
}
