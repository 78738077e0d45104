package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.{Skyline, Stats, Sweepline}
import graft.llm.TokenGraph

/** Round-7 gates for the analytics operators that shipped ungated in
  * round 6 (VERDICT r6 "What's wrong" #2 / ADVICE): the interval sweep
  * line, the 2-D Pareto frontier, the two-sample KS drift monitor, and
  * frontier-expansion BFS. Each oracle follows the determinism recipes:
  * integral arithmetic throughout (`div` on nonnegative operands ==
  * DuckDB `//`), pinned ORDER BY, every computed column aliased
  * identically on both sides.
  */
object FrontierQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q120: peak interval concurrency per event type — each event opens
    // a fixed-duration interval [t, t+dur); the sweep line turns the
    // quadratic "how many overlap?" self-join into two deltas per
    // interval, ONE map-side-combined shuffle at distinct-instant
    // granularity, and a per-group running sum. Ends-meet-starts ties
    // net out before the running sum (an interval ending exactly when
    // another starts never inflates the peak) — same convention in the
    // oracle because both pre-aggregate deltas per instant.
    "q120_peak_concurrency" -> QuerySpec(
      (s, dir) =>
        Sweepline.maxConcurrency(
          Tables.events(s, dir),
          col("event_type"),
          expr("unix_micros(ts) div 1000000"),
          expr("300L + event_id % 600"))
          .orderBy("g"),
      """WITH iv AS (SELECT event_type AS g,
                            CAST(epoch_us(ts) AS BIGINT) // 1000000 AS t0,
                            300 + event_id % 600 AS dur
                     FROM events),
         d AS (SELECT g, t0 AS t, 1 AS d FROM iv
               UNION ALL SELECT g, t0 + dur, -1 FROM iv),
         agg AS (SELECT g, t, CAST(sum(d) AS BIGINT) AS d FROM d GROUP BY 1, 2),
         run AS (SELECT g, t,
                        CAST(sum(d) OVER (PARTITION BY g ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS run
                 FROM agg),
         pk AS (SELECT g, CAST(max(run) AS BIGINT) AS peak,
                       CAST(count(*) AS BIGINT) AS n_points
                FROM run GROUP BY 1)
         SELECT r.g AS g, p.peak, CAST(min(r.t) AS BIGINT) AS peak_at, p.n_points
         FROM run r JOIN pk p ON r.g = p.g AND r.run = p.peak
         GROUP BY r.g, p.peak, p.n_points ORDER BY g"""),

    // Q121: 2-D skyline — per order priority, the orders on the
    // (cheapest price, most recent date) Pareto frontier. The operator
    // is one (group, cost)-sorted window pass (two RANGE-frame maxima
    // sharing a single shuffle); the oracle is the definitional
    // quadratic NOT EXISTS dominance anti-join — the gate proves the
    // linear plan computes the quadratic semantics.
    "q121_skyline" -> QuerySpec(
      (s, dir) => {
        val base = Tables.orders(s, dir).select(
          col("o_orderkey"),
          col("o_orderpriority").as("g"),
          round(col("o_totalprice") * 100).cast("long").as("cost_e2"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("odays"))
        Skyline.frontier2D(base, col("g"), col("cost_e2"), col("odays"))
          .orderBy("o_orderkey")
      },
      """WITH b AS (SELECT o_orderkey, o_orderpriority AS g,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS cost_e2,
                           CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS odays
                    FROM orders)
         SELECT p.o_orderkey, p.g, p.cost_e2, p.odays FROM b p
         WHERE NOT EXISTS (SELECT 1 FROM b q
                           WHERE q.g = p.g
                             AND q.cost_e2 <= p.cost_e2 AND q.odays >= p.odays
                             AND (q.cost_e2 < p.cost_e2 OR q.odays > p.odays))
         ORDER BY p.o_orderkey"""),

    // Q122: two-sample KS drift between the click and purchase value
    // distributions — counts collapse onto the quantization-bounded
    // distinct-value grid (one shuffle), cumulative CDFs walk the grid
    // once, and each CDF is floored into ppm PER SIDE before the gap so
    // every intermediate stays in BIGINT at any corpus size.
    "q122_ks_drift" -> QuerySpec(
      (s, dir) =>
        Stats.ksDriftE6(
          Tables.events(s, dir).select(
            col("event_type"),
            round(col("value") * 100).cast("long").as("v_e2")),
          col("event_type"), col("v_e2"), "click", "purchase"),
      """WITH e AS (SELECT event_type AS p, CAST(round(value * 100) AS BIGINT) AS v
                    FROM events WHERE event_type IN ('click', 'purchase')),
         g AS (SELECT v,
                      CAST(sum(CASE WHEN p = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                      CAST(sum(CASE WHEN p = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
               FROM e GROUP BY 1),
         c AS (SELECT v, CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
                      CAST(sum(cb) OVER w AS BIGINT) AS cum_b
               FROM g WINDOW w AS (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
                      CAST(count(*) AS BIGINT) AS n_grid
               FROM g)
         SELECT t.n_a, t.n_b, t.n_grid,
                CAST(max(abs((c.cum_a * 1000000) // t.n_a
                           - (c.cum_b * 1000000) // t.n_b)) AS BIGINT) AS ks_e6
         FROM c CROSS JOIN t GROUP BY 1, 2, 3"""),

    // Q123: BFS hop distances from the lexicographically-smallest token
    // over the undirected bigram graph, out to 3 hops. The operator is
    // frontier expansion (per-round work = frontier out-degree sum,
    // never all-pairs); the oracle unrolls the three rounds as CTEs
    // with the same visited-set anti-join semantics.
    "q123_bfs_hops" -> QuerySpec(
      (s, dir) =>
        TokenGraph.bfsHops(s, Tables.documents(s, dir), col("text"), maxHops = 3)
          .orderBy("token"),
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         gg AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
         b AS (SELECT toks[i] AS wa, toks[i+1] AS wb FROM gg WHERE toks[i] <> toks[i+1]),
         e AS (SELECT DISTINCT u, v FROM
                 (SELECT wa AS u, wb AS v FROM b UNION ALL SELECT wb, wa FROM b)),
         l0 AS (SELECT min(u) AS token, 0 AS dist FROM e HAVING min(u) IS NOT NULL),
         f1 AS (SELECT DISTINCT e.v AS token FROM e JOIN l0 ON e.u = l0.token),
         l1 AS (SELECT token, 1 AS dist FROM f1
                WHERE token NOT IN (SELECT token FROM l0)),
         f2 AS (SELECT DISTINCT e.v AS token FROM e JOIN l1 ON e.u = l1.token),
         l2 AS (SELECT token, 2 AS dist FROM f2
                WHERE token NOT IN (SELECT token FROM l0
                                    UNION ALL SELECT token FROM l1)),
         f3 AS (SELECT DISTINCT e.v AS token FROM e JOIN l2 ON e.u = l2.token),
         l3 AS (SELECT token, 3 AS dist FROM f3
                WHERE token NOT IN (SELECT token FROM l0
                                    UNION ALL SELECT token FROM l1
                                    UNION ALL SELECT token FROM l2))
         SELECT token, CAST(dist AS INTEGER) AS dist
         FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1
               UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
         ORDER BY token""")
  )
}
