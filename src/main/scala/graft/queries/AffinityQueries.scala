package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{TextHash, TokenGraph}

/** Round-10 session-4 feature-prep and locality surface: leakage-aware
  * target encoding (q262), grid-binned spatial proximity join (q263),
  * per-user interval-union coverage (q264), l-diversity privacy audit
  * (q265), per-token chi-square feature selection (q266), and
  * common-neighbor link prediction (q267).
  */
object AffinityQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q262: leave-one-out target encoding — the leakage-safe
    // categorical encoder: a row's own label is SUBTRACTED from its
    // category aggregate before the mean, so the feature never
    // memorizes the row it describes. Exact integer ppm:
    // (s_c − y)·10⁶ div (n_c − 1), all nonnegative, so truncating
    // `div` and flooring `//` agree. Plan: one vocabulary-sized
    // category rollup, broadcast back onto the fact rows (categories
    // are tiny by definition), map-side encode, rollup — no corpus
    // shuffle beyond the one aggregate.
    "q262_target_encoding" -> QuerySpec(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("g_q262_orders")
        s.sql("""
          WITH y AS (SELECT o_orderkey, o_orderpriority AS cat,
                            o_orderstatus AS status,
                            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                     FROM g_q262_orders),
          agg AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_c,
                         CAST(sum(y) AS BIGINT) AS s_c
                  FROM y GROUP BY 1),
          enc AS (SELECT y.cat, y.status,
                         (agg.s_c - y.y) * 1000000 div (agg.n_c - 1) AS loo_ppm
                  FROM y JOIN agg ON y.cat = agg.cat
                  WHERE agg.n_c > 1)
          SELECT cat, status, CAST(count(*) AS BIGINT) AS n,
                 CAST(min(loo_ppm) AS BIGINT) AS min_loo_ppm,
                 CAST(max(loo_ppm) AS BIGINT) AS max_loo_ppm,
                 CAST(sum(loo_ppm) AS BIGINT) AS sum_loo_ppm
          FROM enc GROUP BY 1, 2 ORDER BY cat, status""")
      },
      """WITH y AS (SELECT o_orderkey, o_orderpriority AS cat,
                           o_orderstatus AS status,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                    FROM orders),
         agg AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_c,
                        CAST(sum(y) AS BIGINT) AS s_c
                 FROM y GROUP BY 1),
         enc AS (SELECT y.cat, y.status,
                        (agg.s_c - y.y) * 1000000 // (agg.n_c - 1) AS loo_ppm
                 FROM y JOIN agg ON y.cat = agg.cat
                 WHERE agg.n_c > 1)
         SELECT cat, status, CAST(count(*) AS BIGINT) AS n,
                CAST(min(loo_ppm) AS BIGINT) AS min_loo_ppm,
                CAST(max(loo_ppm) AS BIGINT) AS max_loo_ppm,
                CAST(sum(loo_ppm) AS BIGINT) AS sum_loo_ppm
         FROM enc GROUP BY 1, 2 ORDER BY cat, status"""),

    // Q263: grid-binned spatial proximity join — the canonical
    // near-join without a cross join: deterministic md5 coordinates on
    // a 10⁶×10⁶ grid, cells of radius width, probe side exploded over
    // its 3×3 cell neighborhood, candidates meet ONLY through the
    // (cell_x, cell_y) equi-join, exact integer d² filter after. A
    // pair meets at exactly one probe offset (the cell delta), so no
    // dedup pass is needed. At 100 TB the shuffle key is the cell —
    // density bounds candidates per key, never the table size.
    "q263_grid_proximity_join" -> QuerySpec(
      (s, dir) => {
        val r = 5000L
        val pts = Tables.customer(s, dir)
          .select(col("c_custkey").as("k"),
            pmod(TextHash.hash60(concat(lit("x|"), col("c_custkey"))),
              lit(1000000L)).as("x"),
            pmod(TextHash.hash60(concat(lit("y|"), col("c_custkey"))),
              lit(1000000L)).as("y"))
          .withColumn("cx", expr(s"x div $r"))
          .withColumn("cy", expr(s"y div $r"))
          .transform(graft.CacheScope.persist)
        val offsets = s.range(9).select(
          expr("id % 3 - 1").as("dx"), expr("id div 3 - 1").as("dy"))
        val probe = pts.crossJoin(broadcast(offsets))
          .select(col("k").as("ka"), col("x").as("xa"), col("y").as("ya"),
            (col("cx") + col("dx")).as("jx"), (col("cy") + col("dy")).as("jy"))
        val pairs = probe.join(
            pts.select(col("k").as("kb"), col("x").as("xb"),
              col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy")),
            Seq("jx", "jy"))
          .filter(col("ka") < col("kb"))
          .withColumn("d2",
            (col("xa") - col("xb")) * (col("xa") - col("xb")) +
              (col("ya") - col("yb")) * (col("ya") - col("yb")))
          .filter(col("d2") <= r * r)
          .select(col("ka"), col("kb"), col("d2"))
          .transform(graft.CacheScope.persist)
        val top = pairs.orderBy(col("d2"), col("ka"), col("kb")).limit(20)
          .select(lit("pair").as("part"), col("ka"), col("kb"), col("d2"))
        val summary = pairs.agg(
          count(lit(1)).as("n"), coalesce(sum(col("d2")), lit(0L)).as("sd2"))
          .select(lit("summary").as("part"), lit(-1L).as("ka"),
            col("n").cast("long").as("kb"), col("sd2").cast("long").as("d2"))
        top.unionByName(summary).orderBy("part", "d2", "ka", "kb")
      },
      s"""WITH p AS (SELECT c_custkey AS k,
                  ${OracleIdioms.hex60("'x|' || CAST(c_custkey AS VARCHAR)")}
                    % 1000000 AS x,
                  ${OracleIdioms.hex60("'y|' || CAST(c_custkey AS VARCHAR)")}
                    % 1000000 AS y
                  FROM customer),
         c AS (SELECT k, x, y, x // 5000 AS cx, y // 5000 AS cy FROM p),
         pairs AS (SELECT a.k AS ka, b.k AS kb,
                          (a.x - b.x) * (a.x - b.x)
                          + (a.y - b.y) * (a.y - b.y) AS d2
                   FROM c a JOIN c b
                     ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
                    AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
                    AND a.k < b.k
                   WHERE (a.x - b.x) * (a.x - b.x)
                         + (a.y - b.y) * (a.y - b.y) <= 25000000),
         top AS (SELECT 'pair' AS part, ka, kb, d2 FROM pairs
                 ORDER BY d2, ka, kb LIMIT 20),
         summary AS (SELECT 'summary' AS part, CAST(-1 AS BIGINT) AS ka,
                            CAST(count(*) AS BIGINT) AS kb,
                            CAST(coalesce(sum(d2), 0) AS BIGINT) AS d2
                     FROM pairs)
         SELECT * FROM top UNION ALL SELECT * FROM summary
         ORDER BY part, d2, ka, kb"""),

    // Q264: per-user interval-union coverage — the sweep-line that
    // turns overlapping activity intervals into exact covered seconds
    // (session time, device uptime, SLA exposure). Islands via the
    // user-partitioned running max of interval ends: a row opens a new
    // island iff its start exceeds every earlier end; island coverage
    // = max(end) − min(start) because an internal gap would have
    // opened a new island. EVERY window is user-partitioned — no
    // global sort anywhere, the q197 lesson applied at authoring time.
    "q264_interval_coverage" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q264_events")
        s.sql("""
          WITH iv AS (SELECT user_id,
                             unix_micros(ts) div 1000000 AS t0,
                             unix_micros(ts) div 1000000
                               + 60 + event_id % 1800 AS t1,
                             event_id
                      FROM g_q264_events),
          flagged AS (SELECT user_id, t0, t1, event_id,
                             CASE WHEN max(t1) OVER (PARTITION BY user_id
                                    ORDER BY t0, t1, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) >= t0
                                  THEN 0 ELSE 1 END AS new_island
                      FROM iv),
          islands AS (SELECT user_id, t0, t1,
                             sum(new_island) OVER (PARTITION BY user_id
                               ORDER BY t0, t1, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
                      FROM flagged),
          per_island AS (SELECT user_id, island,
                                max(t1) - min(t0) AS cov
                         FROM islands GROUP BY 1, 2),
          per_user AS (SELECT user_id,
                              CAST(sum(cov) AS BIGINT) AS coverage_s,
                              CAST(count(*) AS BIGINT) AS n_islands
                       FROM per_island GROUP BY 1),
          top AS (SELECT 'user' AS part, user_id, coverage_s, n_islands
                  FROM per_user
                  ORDER BY coverage_s DESC, user_id LIMIT 20),
          total AS (SELECT 'total' AS part, CAST(-1 AS BIGINT) AS user_id,
                           CAST(sum(coverage_s) AS BIGINT) AS coverage_s,
                           CAST(sum(n_islands) AS BIGINT) AS n_islands
                    FROM per_user)
          SELECT * FROM top UNION ALL SELECT * FROM total
          ORDER BY part, coverage_s DESC, user_id""")
      },
      """WITH iv AS (SELECT user_id,
                            CAST(epoch_us(ts) AS BIGINT) // 1000000 AS t0,
                            CAST(epoch_us(ts) AS BIGINT) // 1000000
                              + 60 + event_id % 1800 AS t1,
                            event_id
                     FROM events),
         flagged AS (SELECT user_id, t0, t1, event_id,
                            CASE WHEN max(t1) OVER (PARTITION BY user_id
                                   ORDER BY t0, t1, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) >= t0
                                 THEN 0 ELSE 1 END AS new_island
                     FROM iv),
         islands AS (SELECT user_id, t0, t1,
                            sum(new_island) OVER (PARTITION BY user_id
                              ORDER BY t0, t1, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
                     FROM flagged),
         per_island AS (SELECT user_id, island, max(t1) - min(t0) AS cov
                        FROM islands GROUP BY 1, 2),
         per_user AS (SELECT user_id,
                             CAST(sum(cov) AS BIGINT) AS coverage_s,
                             CAST(count(*) AS BIGINT) AS n_islands
                      FROM per_island GROUP BY 1),
         top AS (SELECT 'user' AS part, user_id, coverage_s, n_islands
                 FROM per_user
                 ORDER BY coverage_s DESC, user_id LIMIT 20),
         total AS (SELECT 'total' AS part, CAST(-1 AS BIGINT) AS user_id,
                          CAST(sum(coverage_s) AS BIGINT) AS coverage_s,
                          CAST(sum(n_islands) AS BIGINT) AS n_islands
                   FROM per_user)
         SELECT * FROM top UNION ALL SELECT * FROM total
         ORDER BY part, coverage_s DESC, user_id"""),

    // Q265: l-diversity audit — k-anonymity's required companion
    // (q233): a group can be large yet expose everyone in it if the
    // SENSITIVE attribute is uniform. Per quasi-identifier group
    // (segment, nation): size k and sensitive diversity l = distinct
    // order priorities observed; rows with l < 3 are the re-identification
    // surface a release gate must suppress. One grouped aggregate over
    // the joined fact — the QI rollup is dimension-sized.
    "q265_l_diversity" -> QuerySpec(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("g_q265_customer")
        Tables.orders(s, dir).createOrReplaceTempView("g_q265_orders")
        s.sql("""
          SELECT c.c_mktsegment AS segment,
                 CAST(c.c_nationkey AS BIGINT) AS nationkey,
                 CAST(count(*) AS BIGINT) AS k_size,
                 CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l_div,
                 CASE WHEN count(DISTINCT o.o_orderpriority) >= 3
                      THEN 'diverse' ELSE 'VIOLATION' END AS verdict
          FROM g_q265_customer c
          JOIN g_q265_orders o ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2 ORDER BY segment, nationkey""")
      },
      """SELECT c.c_mktsegment AS segment,
                CAST(c.c_nationkey AS BIGINT) AS nationkey,
                CAST(count(*) AS BIGINT) AS k_size,
                CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l_div,
                CASE WHEN count(DISTINCT o.o_orderpriority) >= 3
                     THEN 'diverse' ELSE 'VIOLATION' END AS verdict
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         GROUP BY 1, 2 ORDER BY segment, nationkey"""),

    // Q266: chi-square feature selection — q180's independence test
    // turned PER-FEATURE: for every token, the χ² of its
    // (token-present × language) contingency, top 25 most
    // class-discriminative tokens. The grid is vocabulary×languages —
    // built from two vocabulary-sized rollups, never from the corpus —
    // and the big products route through DECIMAL(38,0)/HUGEINT per the
    // portability contract. This is the one-pass filter that picks
    // label-correlated features before training.
    "q266_chi2_feature_selection" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q266_documents")
        s.sql("""
          WITH w AS (SELECT lang, tok
                     FROM g_q266_documents
                     LATERAL VIEW explode(filter(split(text, ' '),
                       x -> x <> '')) t AS tok),
          o AS (SELECT tok, lang, CAST(count(*) AS BIGINT) AS o
                FROM w GROUP BY 1, 2),
          r AS (SELECT tok, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
          c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
          n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
          grid AS (SELECT r.tok, c.lang, r.r, c.c, n.n,
                          COALESCE(o.o, CAST(0 AS BIGINT)) AS o
                   FROM r CROSS JOIN c CROSS JOIN n
                   LEFT JOIN o ON o.tok = r.tok AND o.lang = c.lang),
          cell AS (SELECT tok,
                          (CAST(o*n - r*c AS DECIMAL(38,0))
                           * CAST(o*n - r*c AS DECIMAL(38,0))
                           * 1000000) div (n*r*c) AS t
                   FROM grid),
          chi AS (SELECT tok, CAST(sum(t) AS BIGINT) AS chi2_ppm
                  FROM cell GROUP BY 1)
          SELECT tok, chi2_ppm FROM chi
          ORDER BY chi2_ppm DESC, tok LIMIT 25""")
      },
      """WITH w AS (SELECT lang,
                           unnest(list_filter(string_split(text, ' '),
                             x -> x <> '')) AS tok
                    FROM documents),
         o AS (SELECT tok, lang, CAST(count(*) AS BIGINT) AS o
               FROM w GROUP BY 1, 2),
         r AS (SELECT tok, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
         c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
         n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
         grid AS (SELECT r.tok, c.lang, r.r, c.c, n.n,
                         COALESCE(o.o, CAST(0 AS BIGINT)) AS o
                  FROM r CROSS JOIN c CROSS JOIN n
                  LEFT JOIN o ON o.tok = r.tok AND o.lang = c.lang),
         cell AS (SELECT tok,
                         (CAST(o*n - r*c AS HUGEINT)
                          * CAST(o*n - r*c AS HUGEINT)
                          * 1000000) // (CAST(n AS HUGEINT)*r*c) AS t
                  FROM grid),
         chi AS (SELECT tok, CAST(sum(t) AS BIGINT) AS chi2_ppm
                 FROM cell GROUP BY 1)
         SELECT tok, chi2_ppm FROM chi
         ORDER BY chi2_ppm DESC, tok LIMIT 25"""),

    // Q267: common-neighbor link prediction on the co-occurrence
    // backbone (q244's graph) — the classic "which edges are missing"
    // primitive: for every NON-adjacent token pair, the number of
    // shared neighbors in the undirected backbone. Wedges come from
    // one equi-join keyed on the CENTER vertex (degree bounds the
    // per-key fanout — the backbone threshold is what keeps hubs
    // tame), adjacency is removed with a left-anti join, never
    // enumerated all-pairs.
    "q267_link_prediction" -> QuerySpec(
      (s, dir) => {
        val weighted = TokenGraph.bigramEdges(
          Tables.documents(s, dir), col("text"))
        val tot = weighted.agg(
          sum(col("c")).cast("long").as("total"),
          count(lit(1)).cast("long").as("n_pairs"))
        val backbone = weighted.crossJoin(broadcast(tot))
          .filter(col("c") * col("n_pairs") >= col("total"))
          .select(col("w1"), col("w2"))
        val und = backbone
          .unionByName(backbone.select(col("w2").as("w1"), col("w1").as("w2")))
          .distinct()
          .transform(graft.CacheScope.persist)
        val wedges = und.select(col("w1").as("a"), col("w2").as("mid"))
          .join(und.select(col("w1").as("mid"), col("w2").as("b")), "mid")
          .filter(col("a") < col("b"))
          .groupBy("a", "b")
          .agg(countDistinct(col("mid")).as("cn"))
        wedges
          .join(und.select(col("w1").as("a"), col("w2").as("b")),
            Seq("a", "b"), "left_anti")
          .orderBy(desc("cn"), col("a"), col("b"))
          .limit(25)
      },
      """WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
         e0 AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1])) AS ab
                FROM d WHERE len(ws) >= 2),
         ec AS (SELECT string_split(ab, ' ')[1] AS w1,
                       string_split(ab, ' ')[2] AS w2,
                       CAST(count(*) AS BIGINT) AS c
                FROM e0 GROUP BY 1, 2),
         e AS (SELECT w1, w2 FROM ec,
                   (SELECT CAST(sum(c) AS BIGINT) AS total,
                           CAST(count(*) AS BIGINT) AS n_pairs FROM ec) t
               WHERE c * n_pairs >= total),
         und AS (SELECT DISTINCT w1, w2 FROM
                   (SELECT w1, w2 FROM e
                    UNION ALL SELECT w2 AS w1, w1 AS w2 FROM e)),
         wedges AS (SELECT l.w2 AS a, r.w2 AS b,
                           CAST(count(DISTINCT l.w1) AS BIGINT) AS cn
                    FROM und l JOIN und r ON l.w1 = r.w1
                    WHERE l.w2 < r.w2
                    GROUP BY 1, 2),
         miss AS (SELECT w.a, w.b, w.cn FROM wedges w
                  LEFT JOIN und u ON u.w1 = w.a AND u.w2 = w.b
                  WHERE u.w1 IS NULL)
         SELECT a, b, cn FROM miss
         ORDER BY cn DESC, a, b LIMIT 25""")
  )
}
