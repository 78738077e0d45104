package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.ConstraintSuite
import graft.analytics.ConstraintSuite.{Satisfies, SubsetOf, Unique}

/** Round-10 session-3 table-governance surface: the one-pass ANALYZE
  * profiler (q240) and the declarative constraint-suite verifier
  * (q245) — the two operators that run BEFORE a 100 TB table is
  * trusted: profile what's in it, then gate publication on what must
  * hold.
  */
object ProfileQueries {

  /** DuckDB emulation of `graft_hll(md5_prefix60(render), 1024).est`
    * over table `src`: registers rebuilt from the same md5 split
    * (index = h mod 1024, width = h div 1024, rho via the
    * powers-of-two VALUES table per OracleIdioms rule 3), estimate as
    * the same exact rational `alpha_m·m³/(10⁴(m+1.079)) / S` with
    * every term integral. Emits a 1-row CTE `x_<sfx>(est)`.
    */
  private def hllEst(sfx: String, render: String): String =
    s"""h_$sfx AS (SELECT DISTINCT ${OracleIdioms.hex60(render)} AS hv
                   FROM src WHERE $render IS NOT NULL),
        b_$sfx AS (SELECT DISTINCT hv % 1024 AS reg, hv // 1024 AS w
                   FROM h_$sfx),
        bl_$sfx AS (SELECT reg, w,
                           sum(CASE WHEN w >= p THEN 1 ELSE 0 END) AS bitlen
                    FROM b_$sfx CROSS JOIN pw GROUP BY 1, 2),
        r_$sfx AS (SELECT reg, max(CASE WHEN w = 0 THEN 51
                                        ELSE 51 - bitlen END) AS mj
                   FROM bl_$sfx GROUP BY 1),
        a_$sfx AS (SELECT sum(CAST(p2.pv AS HUGEINT))
                          + CAST(1024 - count(*) AS HUGEINT)
                            * 1152921504606846976 AS s
                   FROM r_$sfx JOIN p2 ON p2.e = 60 - r_$sfx.mj),
        x_$sfx AS (SELECT CAST((CAST(7213 AS HUGEINT) * 1073741824
                                * 1152921504606846976)
                           // (CAST(10250790 AS HUGEINT) * s) AS BIGINT)
                            AS est
                   FROM a_$sfx)"""

  val specs: Map[String, QuerySpec] = Map(

    // Q240: ANALYZE — the per-column statistics profile every
    // cost-based layer feeds on (null fraction, cardinality, bounds),
    // computed the way a 100 TB engine must: ONE scan producing, per
    // column, the null count, min/max, and an HLL cardinality sketch
    // (constant 1 KiB state, register-max merge — per-shard profiles
    // roll up without re-reading data). The exact NDV rides along to
    // exhibit sketch error (the expand-distinct is the small-scale
    // luxury; at 100 TB only the sketch column survives). All values
    // are hashed/rendered through canonical integer/date/string forms
    // so the profile is engine-portable: numeric minima re-render as
    // cents, dates as ISO strings, and the gate's final columns are
    // BIGINT/VARCHAR only (OracleIdioms rule 1).
    "q240_analyze_stats" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q240_orders")
        // Two aggregation passes over one scan shape, crossed at one
        // row each: mixing five count(DISTINCT …) groups with the
        // TypedImperativeAggregate HLLs in ONE Aggregate makes Spark
        // feed the Expand(×6) rewrite into an object/sort aggregate —
        // measured 10.4 s at sf0.1; split, the sketch pass stays a
        // straight ObjectHashAggregate and the exact-NDV pass keeps
        // the hash-aggregate Expand (1.3 s combined). At 100 TB the
        // exact pass is dropped entirely — the sketch pass IS the
        // profiler.
        s.sql("""
          WITH src AS (SELECT
                 CAST(o_custkey AS STRING) AS r_custkey,
                 o_orderstatus AS r_status,
                 o_orderpriority AS r_priority,
                 CAST(CAST(o_orderdate AS DATE) AS STRING) AS r_date,
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)
                   AS r_total
               FROM g_q240_orders),
          a AS (SELECT count(*) AS n,
                       count(r_custkey) AS c1,
                       graft_hll(md5_prefix60(r_custkey), 1024) AS h1,
                       CAST(min(CAST(r_custkey AS BIGINT)) AS STRING) AS mn1,
                       CAST(max(CAST(r_custkey AS BIGINT)) AS STRING) AS mx1,
                       count(r_status) AS c2,
                       graft_hll(md5_prefix60(r_status), 1024) AS h2,
                       min(r_status) AS mn2, max(r_status) AS mx2,
                       count(r_priority) AS c3,
                       graft_hll(md5_prefix60(r_priority), 1024) AS h3,
                       min(r_priority) AS mn3, max(r_priority) AS mx3,
                       count(r_date) AS c4,
                       graft_hll(md5_prefix60(r_date), 1024) AS h4,
                       min(r_date) AS mn4, max(r_date) AS mx4,
                       count(r_total) AS c5,
                       graft_hll(md5_prefix60(r_total), 1024) AS h5,
                       CAST(min(CAST(r_total AS BIGINT)) AS STRING) AS mn5,
                       CAST(max(CAST(r_total AS BIGINT)) AS STRING) AS mx5
                FROM src),
          d AS (SELECT count(DISTINCT r_custkey) AS d1,
                       count(DISTINCT r_status) AS d2,
                       count(DISTINCT r_priority) AS d3,
                       count(DISTINCT r_date) AS d4,
                       count(DISTINCT r_total) AS d5
                FROM src)
          SELECT col_name, CAST(n AS BIGINT) AS n_rows,
                 CAST(n_null AS BIGINT) AS n_null,
                 CAST(ndv_est AS BIGINT) AS ndv_est,
                 CAST(ndv_exact AS BIGINT) AS ndv_exact, min_s, max_s
          FROM (SELECT n, stack(5,
                  'o_custkey', n - c1, h1.est, d1, mn1, mx1,
                  'o_orderstatus', n - c2, h2.est, d2, mn2, mx2,
                  'o_orderpriority', n - c3, h3.est, d3, mn3, mx3,
                  'o_orderdate', n - c4, h4.est, d4, mn4, mx4,
                  'o_totalprice_cents', n - c5, h5.est, d5, mn5, mx5)
                  AS (col_name, n_null, ndv_est, ndv_exact, min_s, max_s)
                FROM a CROSS JOIN d)
          ORDER BY col_name"""
        )
      },
      s"""WITH pw(p) AS (VALUES ${OracleIdioms.pow2Values50}),
         p2(e, pv) AS (VALUES ${OracleIdioms.pow2Pairs60}),
         src AS (SELECT
             CAST(o_custkey AS VARCHAR) AS r_custkey,
             o_orderstatus AS r_status,
             o_orderpriority AS r_priority,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS r_date,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               AS r_total
           FROM orders),
         ${hllEst("ck", "r_custkey")},
         ${hllEst("st", "r_status")},
         ${hllEst("pr", "r_priority")},
         ${hllEst("dt", "r_date")},
         ${hllEst("tp", "r_total")},
         base AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(count(r_custkey) AS BIGINT) AS c1,
                    CAST(count(DISTINCT r_custkey) AS BIGINT) AS d1,
                    CAST(min(CAST(r_custkey AS BIGINT)) AS VARCHAR) AS mn1,
                    CAST(max(CAST(r_custkey AS BIGINT)) AS VARCHAR) AS mx1,
                    CAST(count(r_status) AS BIGINT) AS c2,
                    CAST(count(DISTINCT r_status) AS BIGINT) AS d2,
                    min(r_status) AS mn2, max(r_status) AS mx2,
                    CAST(count(r_priority) AS BIGINT) AS c3,
                    CAST(count(DISTINCT r_priority) AS BIGINT) AS d3,
                    min(r_priority) AS mn3, max(r_priority) AS mx3,
                    CAST(count(r_date) AS BIGINT) AS c4,
                    CAST(count(DISTINCT r_date) AS BIGINT) AS d4,
                    min(r_date) AS mn4, max(r_date) AS mx4,
                    CAST(count(r_total) AS BIGINT) AS c5,
                    CAST(count(DISTINCT r_total) AS BIGINT) AS d5,
                    CAST(min(CAST(r_total AS BIGINT)) AS VARCHAR) AS mn5,
                    CAST(max(CAST(r_total AS BIGINT)) AS VARCHAR) AS mx5
                  FROM src)
         SELECT 'o_custkey' AS col_name, n AS n_rows, n - c1 AS n_null,
                x_ck.est AS ndv_est, d1 AS ndv_exact,
                mn1 AS min_s, mx1 AS max_s FROM base, x_ck
         UNION ALL
         SELECT 'o_orderstatus', n, n - c2, x_st.est, d2, mn2, mx2
         FROM base, x_st
         UNION ALL
         SELECT 'o_orderpriority', n, n - c3, x_pr.est, d3, mn3, mx3
         FROM base, x_pr
         UNION ALL
         SELECT 'o_orderdate', n, n - c4, x_dt.est, d4, mn4, mx4
         FROM base, x_dt
         UNION ALL
         SELECT 'o_totalprice_cents', n, n - c5, x_tp.est, d5, mn5, mx5
         FROM base, x_tp
         ORDER BY col_name"""),

    // Q245: declarative constraint-suite verification (the Deequ
    // shape) — seven contract checks over orders compiled by
    // [[ConstraintSuite]] into ONE aggregate scan (five row
    // predicates + the exact key-distinct) plus one broadcast
    // anti-join for the customer foreign key. Two checks are
    // deliberately violated by the fixture (prices above 400k, orders
    // after 2000) so both status branches and the violation counters
    // are exercised; metrics are exact ppm integers — the drift
    // signal a daily 100 TB publication gate thresholds without
    // re-scanning history.
    "q245_constraint_suite" -> QuerySpec(
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val customer = Tables.customer(s, dir)
        ConstraintSuite.evaluate(orders, Seq(
          Satisfies("completeness_custkey", col("o_custkey").isNotNull),
          Unique("unique_orderkey", Seq(col("o_orderkey"))),
          Satisfies("status_domain",
            col("o_orderstatus").isin("F", "O", "P")),
          Satisfies("price_positive", col("o_totalprice") > 0),
          Satisfies("price_under_400k", col("o_totalprice") <= 400000.0),
          Satisfies("date_before_2000",
            col("o_orderdate") < lit("2000-01-01").cast("timestamp")),
          SubsetOf("fk_customer", col("o_custkey"), customer, "c_custkey")))
      },
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
         m AS (
           SELECT 'completeness_custkey' AS check_name,
                  CAST(count(o_custkey) AS BIGINT) AS ok FROM orders
           UNION ALL
           SELECT 'unique_orderkey',
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'status_domain',
                  CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'price_positive',
                  CAST(sum(CASE WHEN o_totalprice > 0
                                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'price_under_400k',
                  CAST(sum(CASE WHEN o_totalprice <= 400000
                                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'date_before_2000',
                  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '2000-01-01'
                                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           UNION ALL
           SELECT 'fk_customer',
                  (SELECT CAST(count(*) AS BIGINT)
                   FROM orders o
                   JOIN (SELECT DISTINCT c_custkey FROM customer) c
                     ON o.o_custkey = c.c_custkey))
         SELECT m.check_name,
                CAST((ok * 1000000) // n.n AS BIGINT) AS metric_ppm,
                CAST(n.n - ok AS BIGINT) AS n_violations,
                CASE WHEN ok = n.n THEN 'pass' ELSE 'fail' END AS status
         FROM m, n ORDER BY check_name"""))
}
