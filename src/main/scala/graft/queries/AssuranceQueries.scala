package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 session-4 assurance surface: same-pass observed metrics
  * (q272), bitemporal point-in-time reads (q273), deterministic
  * bootstrap confidence intervals (q274), and homoglyph-skeleton
  * entity resolution (q275).
  */
object AssuranceQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q272: observed metrics (`Dataset.observe` → CollectMetrics) —
    // pipeline telemetry that rides the SAME scan as the result: the
    // row count and quantity total are collected by a plan node while
    // the per-flag aggregate computes, not by a second pass over the
    // table. At 100 TB "how many rows did this job actually read" must
    // not cost another 100 TB scan; this is Spark's native answer. The
    // gate emits the main aggregate and the observed row side by side;
    // the oracle recomputes both (equality proves the observation saw
    // every row exactly once).
    "q272_observed_metrics" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val obs = org.apache.spark.sql.Observation()
        val observed = li.observe(obs,
          count(lit(1)).as("n"),
          sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("qty"))
        val main = observed.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("qty"))
          .select(col("l_returnflag").as("key"),
            col("n").cast("long").as("n"), col("qty").cast("long").as("qty"))
          .transform(graft.CacheScope.persist)
        main.count() // the ONE action; the observation fills on its scan
        val m = obs.get
        val metrics = s.createDataFrame(Seq(
            ("_observed", m("n").asInstanceOf[Long], m("qty").asInstanceOf[Long])))
          .toDF("key", "n", "qty")
        main.unionByName(metrics).orderBy("key")
      },
      """SELECT l_returnflag AS key, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem GROUP BY 1
         UNION ALL
         SELECT '_observed' AS key, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem
         ORDER BY key"""),

    // Q273: bitemporal point-in-time read — the two-clock query a
    // reproducible training snapshot needs: "the state VALID on V, as
    // the system KNEW it at transaction time T". Versions carry
    // valid_from (the order date) and tx_from (when the record landed:
    // order date + a deterministic 0-2 day ingestion lag); the read
    // picks, per customer, the latest valid version among those
    // already known at T — one customer-partitioned window, then a
    // dimension-sized rollup. Late-arriving versions (tx_from > T) are
    // invisible even though their valid_from qualifies, which is
    // exactly the audit property transaction time exists to provide.
    "q273_bitemporal_asof" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q273_orders")
        s.sql("""
          WITH v AS (SELECT o_custkey, o_orderkey, o_orderstatus,
                            o_totalprice,
                            to_date(o_orderdate) AS valid_from,
                            date_add(to_date(o_orderdate),
                              CAST(o_orderkey % 3 AS INT)) AS tx_from
                     FROM g_q273_orders),
          known AS (SELECT *,
                           row_number() OVER (PARTITION BY o_custkey
                             ORDER BY valid_from DESC, o_orderkey DESC) AS rk
                    FROM v
                    WHERE valid_from <= DATE'1999-06-15'
                      AND tx_from <= DATE'1999-07-01'),
          pick AS (SELECT * FROM known WHERE rk = 1)
          SELECT o_orderstatus AS status,
                 CAST(count(*) AS BIGINT) AS n_customers,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS sum_cents,
                 CAST(min(valid_from) AS DATE) AS oldest_valid,
                 CAST(max(valid_from) AS DATE) AS newest_valid
          FROM pick GROUP BY 1 ORDER BY status""")
      },
      """WITH v AS (SELECT o_custkey, o_orderkey, o_orderstatus,
                           o_totalprice,
                           o_orderdate::DATE AS valid_from,
                           o_orderdate::DATE
                             + CAST(o_orderkey % 3 AS INT) AS tx_from
                    FROM orders),
         known AS (SELECT *,
                          row_number() OVER (PARTITION BY o_custkey
                            ORDER BY valid_from DESC, o_orderkey DESC) AS rk
                   FROM v
                   WHERE valid_from <= DATE '1999-06-15'
                     AND tx_from <= DATE '1999-07-01'),
         pick AS (SELECT * FROM known WHERE rk = 1)
         SELECT o_orderstatus AS status,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_cents,
                CAST(min(valid_from) AS DATE) AS oldest_valid,
                CAST(max(valid_from) AS DATE) AS newest_valid
         FROM pick GROUP BY 1 ORDER BY status"""),

    // Q274: deterministic bootstrap CI — resampling-based uncertainty
    // for a metric the central limit theorem shouldn't be trusted on,
    // DERANDOMIZED the q185 way: resample b picks month
    // hash60('bs|'||b||'|'||i) mod 80 for each of 80 slots, so the
    // whole procedure is a pure function of the data. The corpus
    // collapses to the 80-month relation FIRST; the 200×80 pick matrix
    // is generator-sized, the percentile window runs over 200 rows.
    // Everything integer cents — both engines agree bit-for-bit.
    "q274_bootstrap_ci" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q274_orders")
        s.sql(s"""
          WITH months AS (SELECT (year(o_orderdate) - 1995) * 12
                                   + month(o_orderdate) - 1 AS m,
                                 CAST(sum(CAST(round(o_totalprice * 100)
                                               AS BIGINT)) AS BIGINT) AS y
                          FROM g_q274_orders GROUP BY 1),
          picks AS (SELECT b.id AS b, i.id AS i,
                           pmod(md5_prefix60(concat('bs|',
                             CAST(b.id AS STRING), '|',
                             CAST(i.id AS STRING))), 80L) AS pick
                    FROM range(200) b CROSS JOIN range(80) i),
          sums AS (SELECT p.b,
                          CAST(sum(mo.y) AS BIGINT) AS total,
                          CAST(sum(mo.y) div 80 AS BIGINT) AS mean_cents
                   FROM picks p JOIN months mo ON mo.m = p.pick
                   GROUP BY p.b),
          ranked AS (SELECT mean_cents,
                            row_number() OVER (ORDER BY mean_cents, b) AS rn
                     FROM sums),
          obs AS (SELECT CAST(sum(y) div 80 AS BIGINT) AS observed_mean
                  FROM months)
          SELECT (SELECT mean_cents FROM ranked WHERE rn = 10) AS ci_lo,
                 (SELECT observed_mean FROM obs) AS observed_mean,
                 (SELECT mean_cents FROM ranked WHERE rn = 190) AS ci_hi,
                 CAST(200 AS BIGINT) AS n_resamples""")
      },
      s"""WITH months AS (SELECT (year(o_orderdate) - 1995) * 12
                                  + month(o_orderdate) - 1 AS m,
                                CAST(sum(CAST(round(o_totalprice * 100)
                                              AS BIGINT)) AS BIGINT) AS y
                         FROM orders GROUP BY 1),
         picks AS (SELECT b.b, i.i,
                          ${OracleIdioms.hex60(
                            "'bs|' || CAST(b.b AS VARCHAR) || '|' || CAST(i.i AS VARCHAR)")}
                            % 80 AS pick
                   FROM generate_series(0, 199) b(b),
                        generate_series(0, 79) i(i)),
         sums AS (SELECT p.b,
                         CAST(sum(mo.y) AS BIGINT) AS total,
                         CAST(sum(mo.y) // 80 AS BIGINT) AS mean_cents
                  FROM picks p JOIN months mo ON mo.m = p.pick
                  GROUP BY p.b),
         ranked AS (SELECT mean_cents,
                           row_number() OVER (ORDER BY mean_cents, b) AS rn
                    FROM sums),
         obs AS (SELECT CAST(sum(y) // 80 AS BIGINT) AS observed_mean
                 FROM months)
         SELECT (SELECT mean_cents FROM ranked WHERE rn = 10) AS ci_lo,
                (SELECT observed_mean FROM obs) AS observed_mean,
                (SELECT mean_cents FROM ranked WHERE rn = 190) AS ci_hi,
                CAST(200 AS BIGINT) AS n_resamples"""),

    // Q275: homoglyph-skeleton entity resolution — the adversarial
    // near-duplicate exact dedup can't see: names where Cyrillic
    // а/е/о replaced Latin a/e/o render identically but hash
    // differently. The fixture plants variants deterministically
    // (every 7th customer), the detector folds every confusable to its
    // ASCII skeleton (one map-only translate) and groups — raw
    // equality finds 0 of the planted pairs, the skeleton join finds
    // all of them. Same shape as spam/phishing normalization at corpus
    // scale: normalize-then-hash, never pairwise-compare.
    "q275_homoglyph_resolution" -> QuerySpec(
      (s, dir) => {
        val clean = Tables.customer(s, dir)
          .select(col("c_custkey").as("k"), col("c_name").as("name"))
        val dirty = clean.filter(pmod(col("k"), lit(7L)) === 0)
          .select((col("k") + 10000000L).as("k"),
            translate(col("name"), "aeo", "аео").as("name"))
        val all = clean.unionByName(dirty)
          .withColumn("skeleton",
            translate(col("name"), "аео", "aeo"))
          .transform(graft.CacheScope.persist)
        val pairs = all.select(col("k").as("k1"), col("name").as("n1"),
            col("skeleton"))
          .join(all.select(col("k").as("k2"), col("name").as("n2"),
            col("skeleton")), "skeleton")
          .filter(col("k1") < col("k2") && col("n1") =!= col("n2"))
          .select(col("k1"), col("k2"))
          .transform(graft.CacheScope.persist)
        val top = pairs.orderBy("k1", "k2").limit(20)
          .select(lit("pair").as("part"), col("k1"), col("k2"))
        val summary = pairs.agg(count(lit(1)).as("n"))
          .select(lit("summary").as("part"), lit(-1L).as("k1"),
            col("n").cast("long").as("k2"))
        top.unionByName(summary).orderBy("part", "k1", "k2")
      },
      """WITH clean AS (SELECT c_custkey AS k, c_name AS name FROM customer),
         dirty AS (SELECT k + 10000000 AS k,
                          translate(name, 'aeo',
                            chr(1072) || chr(1077) || chr(1086)) AS name
                   FROM clean WHERE k % 7 = 0),
         allr AS (SELECT k, name,
                         translate(name,
                           chr(1072) || chr(1077) || chr(1086), 'aeo')
                           AS skeleton
                  FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty)),
         pairs AS (SELECT a.k AS k1, b.k AS k2
                   FROM allr a JOIN allr b ON a.skeleton = b.skeleton
                   WHERE a.k < b.k AND a.name <> b.name),
         top AS (SELECT 'pair' AS part, k1, k2 FROM pairs
                 ORDER BY k1, k2 LIMIT 20),
         summary AS (SELECT 'summary' AS part, CAST(-1 AS BIGINT) AS k1,
                            CAST(count(*) AS BIGINT) AS k2
                     FROM pairs)
         SELECT * FROM top UNION ALL SELECT * FROM summary
         ORDER BY part, k1, k2"""),

    // Q277: join-skew advisor — the measurement that DECIDES the
    // salting the engine already implements (q104/q57/q129): per join
    // key, compare its row count to the table mean with
    // cross-multiplied integers (n·n_keys > 2·total — no float ratio,
    // no division), and for hot keys emit the salt factor
    // ceil(n·n_keys / total) that equalizes the partitions. One
    // key-rollup pass; the advisor output is heavy-hitter-sized. At
    // 100 TB you run THIS first, then write the salted join with its
    // numbers instead of a guessed constant.
    "q277_skew_advisor" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q277_orders")
        s.sql("""
          WITH k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                     FROM g_q277_orders GROUP BY 1),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                         CAST(count(*) AS BIGINT) AS n_keys
                  FROM k),
          hot AS (SELECT o_custkey, n,
                         CAST((n * n_keys + total - 1) div total AS BIGINT)
                           AS salt_factor
                  FROM k CROSS JOIN tot
                  WHERE n * n_keys > 2 * total),
          top AS (SELECT 'hot_key' AS part, o_custkey, n, salt_factor
                  FROM hot ORDER BY n DESC, o_custkey LIMIT 20),
          summary AS (SELECT 'summary' AS part,
                             CAST(-1 AS BIGINT) AS o_custkey,
                             CAST(count(*) AS BIGINT) AS n,
                             CAST(coalesce(max(salt_factor), 0) AS BIGINT)
                               AS salt_factor
                      FROM hot)
          SELECT * FROM top UNION ALL SELECT * FROM summary
          ORDER BY part, n DESC, o_custkey""")
      },
      """WITH k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                    FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                        CAST(count(*) AS BIGINT) AS n_keys
                 FROM k),
         hot AS (SELECT o_custkey, n,
                        CAST((n * n_keys + total - 1) // total AS BIGINT)
                          AS salt_factor
                 FROM k CROSS JOIN tot
                 WHERE n * n_keys > 2 * total),
         top AS (SELECT 'hot_key' AS part, o_custkey, n, salt_factor
                 FROM hot ORDER BY n DESC, o_custkey LIMIT 20),
         summary AS (SELECT 'summary' AS part,
                            CAST(-1 AS BIGINT) AS o_custkey,
                            CAST(count(*) AS BIGINT) AS n,
                            CAST(coalesce(max(salt_factor), 0) AS BIGINT)
                              AS salt_factor
                     FROM hot)
         SELECT * FROM top UNION ALL SELECT * FROM summary
         ORDER BY part, n DESC, o_custkey"""),

    // Q278: runtime BLOOM-FILTER join pruning — the row-level sibling
    // of DPP (q268): Spark builds a bloom filter from the SELECTIVE
    // build side at runtime and injects might_contain() into the probe
    // side's scan, discarding non-joining rows BEFORE the shuffle. The
    // gate forces the shuffle-join path (broadcast off) and lowers the
    // size thresholds that gate injection at toy scale — at 100 TB the
    // defaults fire on their own. Confs flip only inside the eager
    // read window; ScaleTechniquesSpec asserts might_contain lands in
    // the executed plan.
    "q278_runtime_bloom_join" -> QuerySpec(
      (s, dir) => {
        val prevB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        try {
          val li = Tables.lineitem(s, dir)
          val o = Tables.orders(s, dir)
            .filter(col("o_orderpriority") === "1-URGENT")
          val rows = li.join(o, li("l_orderkey") === o("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n"),
              sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("qty"))
            .select(col("o_orderstatus").as("status"),
              col("n").cast("long").as("n"), col("qty").cast("long").as("qty"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .toSeq
          s.createDataFrame(rows).toDF("status", "n", "qty")
            .orderBy("status")
        } finally {
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
          s.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        }
      },
      """SELECT o.o_orderstatus AS status,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY status"""),

    // Q279: SQL-defined scalar function (CREATE FUNCTION … RETURN) —
    // the catalog surface that lets a team publish ONE governed metric
    // definition instead of copy-pasted expressions: the cents
    // conversion lives in the session catalog and every query calls it
    // by name; Catalyst inlines the body, so it costs nothing at
    // execution. The oracle inlines the same expression — equality
    // proves the function body, registration, and call path.
    "q279_sql_udf" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q279_orders")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION g_q279_cents(p DOUBLE)
                 RETURNS BIGINT RETURN CAST(round(p * 100) AS BIGINT)""")
        s.sql("""
          SELECT o_orderpriority AS priority,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(g_q279_cents(o_totalprice)) AS BIGINT) AS cents,
                 CAST(max(g_q279_cents(o_totalprice)) AS BIGINT) AS max_cents
          FROM g_q279_orders GROUP BY 1 ORDER BY priority""")
      },
      """SELECT o_orderpriority AS priority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents,
                CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS max_cents
         FROM orders GROUP BY 1 ORDER BY priority"""),

    // Q280: parameterized SQL (`spark.sql(text, args)`) — named
    // placeholders bind as LITERALS in the parsed plan, not string
    // splices: the date and segment below arrive as typed parameters,
    // which is both the injection-safe API and the plan-cache-friendly
    // one (same text, different args → same parsed shape). The oracle
    // inlines the same constants.
    "q280_parameterized_sql" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q280_orders")
        Tables.customer(s, dir).createOrReplaceTempView("g_q280_customer")
        s.sql(
          """SELECT c.c_mktsegment AS segment,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS cents
             FROM g_q280_orders o
             JOIN g_q280_customer c ON c.c_custkey = o.o_custkey
             WHERE o.o_orderdate >= :cutoff
               AND c.c_mktsegment <> :excluded
             GROUP BY 1 ORDER BY segment""",
          Map("cutoff" -> java.sql.Date.valueOf("1998-01-01"),
            "excluded" -> "MACHINERY"))
      },
      """SELECT c.c_mktsegment AS segment,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         WHERE o.o_orderdate >= DATE '1998-01-01'
           AND c.c_mktsegment <> 'MACHINERY'
         GROUP BY 1 ORDER BY segment"""),

    // Q281: rule-based mode imputation — the repair step between
    // validation (q245 says "nationkey is null for 7% of rows") and
    // training: fill each synthetic-missing nationkey with its
    // segment's MODAL nation (ties → smallest key, so the rule is a
    // function, not a coin flip), and publish the audit of what was
    // imputed with what. Mode is a dimension-sized rollup + one
    // per-segment top-1; the fill is a broadcast join back onto the
    // rows.
    "q281_mode_imputation" -> QuerySpec(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("g_q281_customer")
        s.sql("""
          WITH base AS (SELECT c_custkey, c_mktsegment,
                               CASE WHEN c_custkey % 13 = 0 THEN NULL
                                    ELSE CAST(c_nationkey AS BIGINT) END
                                 AS nationkey
                        FROM g_q281_customer),
          modes AS (SELECT c_mktsegment, nationkey AS mode_nation,
                           cnt,
                           row_number() OVER (PARTITION BY c_mktsegment
                             ORDER BY cnt DESC, nationkey) AS rk
                    FROM (SELECT c_mktsegment, nationkey,
                                 CAST(count(*) AS BIGINT) AS cnt
                          FROM base WHERE nationkey IS NOT NULL
                          GROUP BY 1, 2)),
          pick AS (SELECT c_mktsegment, mode_nation, cnt
                   FROM modes WHERE rk = 1),
          filled AS (SELECT b.c_mktsegment,
                            coalesce(b.nationkey, p.mode_nation) AS nationkey,
                            CASE WHEN b.nationkey IS NULL THEN 1 ELSE 0 END
                              AS was_imputed
                     FROM base b
                     JOIN pick p ON p.c_mktsegment = b.c_mktsegment)
          SELECT f.c_mktsegment AS segment,
                 CAST(p.mode_nation AS BIGINT) AS mode_nation,
                 CAST(p.cnt AS BIGINT) AS mode_support,
                 CAST(sum(f.was_imputed) AS BIGINT) AS n_imputed,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(f.nationkey) AS BIGINT) AS nation_checksum
          FROM filled f JOIN pick p ON p.c_mktsegment = f.c_mktsegment
          GROUP BY 1, 2, 3 ORDER BY segment""")
      },
      """WITH base AS (SELECT c_custkey, c_mktsegment,
                              CASE WHEN c_custkey % 13 = 0 THEN NULL
                                   ELSE CAST(c_nationkey AS BIGINT) END
                                AS nationkey
                       FROM customer),
         modes AS (SELECT c_mktsegment, nationkey AS mode_nation,
                          cnt,
                          row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY cnt DESC, nationkey) AS rk
                   FROM (SELECT c_mktsegment, nationkey,
                                CAST(count(*) AS BIGINT) AS cnt
                         FROM base WHERE nationkey IS NOT NULL
                         GROUP BY 1, 2)),
         pick AS (SELECT c_mktsegment, mode_nation, cnt
                  FROM modes WHERE rk = 1),
         filled AS (SELECT b.c_mktsegment,
                           coalesce(b.nationkey, p.mode_nation) AS nationkey,
                           CASE WHEN b.nationkey IS NULL THEN 1 ELSE 0 END
                             AS was_imputed
                    FROM base b
                    JOIN pick p ON p.c_mktsegment = b.c_mktsegment)
         SELECT f.c_mktsegment AS segment,
                CAST(p.mode_nation AS BIGINT) AS mode_nation,
                CAST(p.cnt AS BIGINT) AS mode_support,
                CAST(sum(f.was_imputed) AS BIGINT) AS n_imputed,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(f.nationkey) AS BIGINT) AS nation_checksum
         FROM filled f JOIN pick p ON p.c_mktsegment = f.c_mktsegment
         GROUP BY 1, 2, 3 ORDER BY segment"""),

    // Q282: classical seasonal decomposition, integerized — the 2×12
    // centered moving average (half-weight endpoints) extracts trend
    // from the monthly revenue series; the per-calendar-month mean of
    // the detrended residue is the seasonal index. Everything stays in
    // cents: the doubled-weight window sum T2 = y₋₆ + 2Σy + y₊₆ makes
    // the half weights integral, trend = T2 div 24. The corpus
    // collapses to the 80-month relation FIRST; the window self-join
    // is 80×13. This is how you de-seasonalize a metric before
    // anomaly-gating it (q80) without a single float.
    "q282_seasonal_decomposition" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q282_orders")
        s.sql("""
          WITH months AS (SELECT (year(o_orderdate) - 1995) * 12
                                   + month(o_orderdate) - 1 AS m,
                                 month(o_orderdate) AS moy,
                                 CAST(sum(CAST(round(o_totalprice * 100)
                                               AS BIGINT)) AS BIGINT) AS y
                          FROM g_q282_orders GROUP BY 1, 2),
          win AS (SELECT a.m, a.moy, a.y,
                         CAST(sum(CASE WHEN abs(b.m - a.m) = 6 THEN b.y
                                       ELSE 2 * b.y END) AS BIGINT) AS t2,
                         CAST(count(*) AS BIGINT) AS covered
                  FROM months a JOIN months b ON abs(b.m - a.m) <= 6
                  GROUP BY 1, 2, 3),
          det AS (SELECT moy, y - t2 div 24 AS d
                  FROM win WHERE covered = 13),
          seasonal AS (SELECT moy, CAST(count(*) AS BIGINT) AS n_terms,
                              CAST(sum(d) AS BIGINT) AS sum_d
                       FROM det GROUP BY 1)
          SELECT CAST(moy AS BIGINT) AS moy, n_terms,
                 CAST(CASE WHEN sum_d >= 0 THEN sum_d div n_terms
                           ELSE -((-sum_d) div n_terms) END
                      AS BIGINT) AS seasonal_cents
          FROM seasonal ORDER BY moy""")
      },
      """WITH months AS (SELECT (year(o_orderdate) - 1995) * 12
                                  + month(o_orderdate) - 1 AS m,
                                month(o_orderdate) AS moy,
                                CAST(sum(CAST(round(o_totalprice * 100)
                                              AS BIGINT)) AS BIGINT) AS y
                         FROM orders GROUP BY 1, 2),
         win AS (SELECT a.m, a.moy, a.y,
                        CAST(sum(CASE WHEN abs(b.m - a.m) = 6 THEN b.y
                                      ELSE 2 * b.y END) AS BIGINT) AS t2,
                        CAST(count(*) AS BIGINT) AS covered
                 FROM months a JOIN months b ON abs(b.m - a.m) <= 6
                 GROUP BY 1, 2, 3),
         det AS (SELECT moy, y - t2 // 24 AS d
                 FROM win WHERE covered = 13),
         seasonal AS (SELECT moy, CAST(count(*) AS BIGINT) AS n_terms,
                             CAST(sum(d) AS BIGINT) AS sum_d
                      FROM det GROUP BY 1)
         SELECT CAST(moy AS BIGINT) AS moy, n_terms,
                CAST(CASE WHEN sum_d >= 0 THEN sum_d // n_terms
                          ELSE -((-sum_d) // n_terms) END
                     AS BIGINT) AS seasonal_cents
         FROM seasonal ORDER BY moy"""),

    // Q283: STREAMING observed metrics — q272's telemetry on the
    // streaming plane: `observe` attaches CollectMetrics to the
    // micro-batch plan and every StreamingQueryProgress carries that
    // batch's row count and value total; summing across the progress
    // log reconstructs the whole drain without touching the sink. At
    // 100 TB this is how a pipeline proves "every ingested row was
    // counted" — the metrics ride the ingest, reconciliation reads the
    // progress log, and the sink is never re-scanned. The gate emits
    // the progress-log totals next to the sink rollup; the oracle
    // recomputes both from the source table (equality = the
    // observation saw exactly the drained rows).
    "q283_streaming_observe" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q283")
        val tmp = tmpPath.toString
        Tables.events(s, dir)
          .select(col("event_type"), col("value"))
          .coalesce(1).write.parquet(s"$tmp/staging")
        val stream = s.readStream
          .schema("event_type STRING, value DOUBLE")
          .parquet(s"$tmp/staging")
          .observe("q283_metrics",
            count(lit(1)).as("n"),
            sum(expr("CAST(floor(value) AS BIGINT)")).as("val_sum"))
        val q = stream.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/checkpoint")
          .format("parquet").option("path", s"$tmp/out")
          .start()
        q.awaitTermination()
        val observed = q.recentProgress.toSeq
          .flatMap(p => Option(p.observedMetrics.get("q283_metrics")))
          .map(r => (r.getAs[Long]("n"), r.getAs[Long]("val_sum")))
        val metrics = s.createDataFrame(Seq((
            "_observed",
            observed.map(_._1).sum,
            observed.map(_._2).sum)))
          .toDF("key", "n", "val_sum")
        s.read.parquet(s"$tmp/out")
          .groupBy(col("event_type").as("key"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(expr("CAST(floor(value) AS BIGINT)")).cast("long")
              .as("val_sum"))
          .unionByName(metrics)
          .orderBy("key")
      },
      """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS val_sum
         FROM events GROUP BY 1
         UNION ALL
         SELECT '_observed' AS key, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS val_sum
         FROM events
         ORDER BY key"""),

    // Q289: foreachBatch multi-sink fanout with batch-keyed
    // idempotence — the pattern for "one stream, two destinations,
    // exactly-once on both": each micro-batch lands in a
    // batch=<id>-keyed directory with MODE OVERWRITE (a replayed batch
    // rewrites its own slot instead of duplicating) and appends the
    // same batch's rollup to a ledger keyed the same way. The drain is
    // forced through 4 batches (4 staged files, maxFilesPerTrigger=1)
    // so the idempotence key actually varies; the gate emits the data
    // sink's rollup, the ledger's reconciliation row, and the batch
    // count — all three must agree with the batch oracle.
    "q289_foreachbatch_fanout" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q289")
        val tmp = tmpPath.toString
        Tables.events(s, dir)
          .select(col("event_type"), col("value"))
          .repartition(4).write.parquet(s"$tmp/staging")
        val stream = s.readStream
          .schema("event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/staging")
        val q = stream.writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/checkpoint")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            val b = batch.persist()
            // sink A: the data, slotted by batch id (replay overwrites)
            b.write.mode("overwrite").parquet(s"$tmp/data/batch=$id")
            // sink B: the per-batch ledger, same idempotence key
            b.agg(count(lit(1)).cast("long").as("n"),
                sum(expr("CAST(floor(value) AS BIGINT)")).cast("long")
                  .as("val_sum"))
              .write.mode("overwrite").parquet(s"$tmp/ledger/batch=$id")
            b.unpersist()
            ()
          }
          .start()
        q.awaitTermination()
        val data = s.read.parquet(s"$tmp/data")
          .groupBy(col("event_type").as("key"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(expr("CAST(floor(value) AS BIGINT)")).cast("long")
              .as("val_sum"))
        val ledger = s.read.parquet(s"$tmp/ledger")
          .agg(count(lit(1)).cast("long").as("batches"),
            sum("n").cast("long").as("n"),
            sum("val_sum").cast("long").as("val_sum"))
        val rows = ledger.select(lit("_ledger").as("key"), col("n"),
            col("val_sum"))
          .unionByName(ledger.select(lit("_batches").as("key"),
            col("batches").as("n"), lit(0L).as("val_sum")))
        data.unionByName(rows).orderBy("key")
      },
      """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS val_sum
         FROM events GROUP BY 1
         UNION ALL
         SELECT '_ledger' AS key, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS val_sum
         FROM events
         UNION ALL
         SELECT '_batches' AS key, CAST(4 AS BIGINT) AS n,
                CAST(0 AS BIGINT) AS val_sum
         ORDER BY key"""),

    // Q290: V2 STREAMING sink with epoch-keyed 2PC — the checksum
    // sink's streaming leg: each micro-batch commits its merged task
    // partials under its epochId, a replayed epoch REPLACES its slot
    // (exactly-once aggregate from at-least-once delivery —
    // ChecksumSinkSpec pins the replay path directly), and the
    // cumulative digest republishes after every epoch. The gate drains
    // a 4-epoch stream and pins the final digest against the batch
    // oracle: any dropped or double-counted epoch moves all three
    // columns.
    "q290_dsv2_streaming_sink" -> QuerySpec(
      (s, dir) => {
        val tmpPath = GateTmp.dir("graft-q290")
        val tmp = tmpPath.toString
        val tag = "q290-" + Integer.toHexString(dir.hashCode)
        graft.sources.ChecksumSink.clear(tag)
        Tables.events(s, dir)
          .select(expr("CAST(floor(value) AS BIGINT)").as("v"))
          .repartition(4).write.parquet(s"$tmp/staging")
        val q = s.readStream
          .schema("v BIGINT")
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/staging")
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/checkpoint")
          .format("graft.sources.ChecksumSink")
          .option("tag", tag)
          .start()
        q.awaitTermination()
        val d = graft.sources.ChecksumSink.result(tag).getOrElse(
          sys.error("streaming sink published nothing"))
        s.createDataFrame(Seq((d.rows, d.sum, d.xor)))
          .toDF("n_rows", "sum_v", "xor_v")
      },
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(v) AS BIGINT) AS sum_v,
                CAST(bit_xor(v) AS BIGINT) AS xor_v
         FROM (SELECT CAST(floor(value) AS BIGINT) AS v FROM events)""")
  )
}
