package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.{GridQuantiles, Skyline, Stats, Sweepline}
import graft.llm.TokenGraph

/** Round-7 gates. q120–q123 close the round-6 gap (operators that
  * shipped ungated): the interval sweep line, the 2-D Pareto frontier,
  * the two-sample KS drift monitor, and frontier-expansion BFS.
  * q125–q128 and q131 add graph-statistics and similarity depth: local
  * clustering coefficients, degree assortativity, the TPC-H Q7 join
  * shape, redistribute-sink PageRank, and the FastSS deletion-
  * neighborhood edit-distance join. q132–q135 cover the GROUPING SETS
  * surface, LOCF forward fill, planning-time partition pruning, and
  * mergeSchema evolution reads. Each oracle follows the determinism
  * recipes: integral arithmetic throughout (`div` on nonnegative
  * operands == DuckDB `//`), pinned ORDER BY, every computed column
  * aliased identically on both sides.
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
                    FROM events
                    WHERE event_type IN ('click', 'purchase')
                      AND value IS NOT NULL),
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
         ORDER BY token"""),

    // Q125: per-token local clustering coefficient in floored ppm —
    // degree-oriented triangle enumeration (fan-out bounded by √|E|),
    // corners exploded and counted per node, coefficient =
    // 2·tri·10⁶ div deg·(deg−1) in pure integral arithmetic. The
    // oracle enumerates triangles with the u<v orientation — per-node
    // participation is orientation-invariant.
    "q125_local_clustering" -> QuerySpec(
      (s, dir) =>
        graft.analytics.Triangles.localClusteringE6(
          bigramCanonicalEdges(s, dir), col("u"), col("v"))
          .orderBy("token"),
      """WITH t AS (SELECT string_split(text,' ') AS toks FROM documents),
         g AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t),
         bg AS (SELECT toks[i] AS wa, toks[i+1] AS wb FROM g
                WHERE toks[i] <> toks[i+1]),
         e AS (SELECT DISTINCT least(wa, wb) AS u, greatest(wa, wb) AS v FROM bg),
         d AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
                 (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
         tr AS (SELECT e1.u AS a, e1.v AS b2, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
                          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         corners AS (SELECT a AS n FROM tr UNION ALL SELECT b2 FROM tr
                     UNION ALL SELECT c FROM tr),
         tc AS (SELECT n, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY 1)
         SELECT d.n AS token, d.deg, COALESCE(tc.n_tri, 0) AS n_tri,
                CASE WHEN d.deg > 1
                     THEN (2 * COALESCE(tc.n_tri, 0) * 1000000)
                          // (d.deg * (d.deg - 1))
                     ELSE 0 END AS lcc_e6
         FROM d LEFT JOIN tc ON d.n = tc.n ORDER BY token"""),

    // Q126: degree assortativity of the token graph — Pearson
    // correlation of endpoint degrees over every directed edge (both
    // orientations, the standard undirected convention), via the exact
    // integer power sums of Stats.corrE6: order-free BIGINT addition +
    // one pinned IEEE expression, bit-reproducible cross-engine.
    "q126_assortativity" -> QuerySpec(
      (s, dir) => {
        val e = graft.CacheScope.persist(bigramCanonicalEdges(s, dir))
        val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        val both = e.select(col("u"), col("v"))
          .unionAll(e.select(col("v").as("u"), col("u").as("v")))
        val x = both
          .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
          .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
        Stats.corrE6(x, lit("all"), col("du"), col("dv")).orderBy("g")
      },
      """WITH t AS (SELECT string_split(text,' ') AS toks FROM documents),
         g0 AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t),
         bg AS (SELECT toks[i] AS wa, toks[i+1] AS wb FROM g0
                WHERE toks[i] <> toks[i+1]),
         e AS (SELECT DISTINCT least(wa, wb) AS u, greatest(wa, wb) AS v FROM bg),
         d AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
                 (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
         x AS (SELECT du.deg AS x, dv.deg AS y
               FROM (SELECT u, v FROM e UNION ALL SELECT v, u FROM e) ed
               JOIN d du ON ed.u = du.n JOIN d dv ON ed.v = dv.n),
         s AS (SELECT 'all' AS g, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*y) AS BIGINT) AS sxy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(y*y) AS BIGINT) AS syy
               FROM x)
         SELECT g, n, sx, sy,
                CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
                  CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
                    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                       * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
                    * 1000000.0) AS BIGINT) END AS corr_e6
         FROM s ORDER BY g"""),

    // Q127: TPC-H Q7 shape (two-nation shipping volume) — only the
    // 2-row nation slices are broadcast-HINTED; they pre-filter
    // customer and supplier (to the two nations' rows) BEFORE those
    // relations meet the facts, and customer/supplier themselves get
    // no hint: they are fact-scaled at 100 TB, so the planner keeps
    // them shuffle-joined at scale (AQE broadcasts them at gate scale
    // where they measure small — the decision stays a statistics
    // decision, not a hardcoded one). The shipdate window is pushed
    // into the lineitem scan.
    "q127_two_nation_volume" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(to_date(col("l_shipdate")) >= to_date(lit("1996-01-01"))
            && to_date(col("l_shipdate")) < to_date(lit("1998-01-01")))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(to_date(col("l_shipdate"))).cast("long").as("l_year"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_term"))
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val n1 = Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
        val custF = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(n2), col("c_nationkey") === col("cust_nk"))
        val supF = Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))
          .join(broadcast(n1), col("s_nationkey") === col("supp_nk"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(custF, col("o_custkey") === col("c_custkey"))
          .join(supF, col("l_suppkey") === col("s_suppkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(count(lit(1)).as("cnt"), sum(col("rev_term")).as("rev_e4"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                     AS BIGINT) AS rev_e4
         FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         WHERE n1.n_name IN ('NATION_1', 'NATION_2')
           AND n2.n_name IN ('NATION_1', 'NATION_2')
           AND n1.n_name <> n2.n_name
           AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),

    // Q128: the redistribute-sinks PageRank variant (q111 gates the
    // default drop-sink formulation) — two unrolled damping rounds
    // where each round's total sink mass is shared equally across all
    // nodes before damping, all in integral ppm arithmetic.
    "q128_pagerank_redistribute" -> QuerySpec(
      (s, dir) =>
        TokenGraph.pagerankE6(s, Tables.documents(s, dir), col("text"),
          iters = 2, redistributeSinks = true)
          .orderBy("token"),
      """WITH t AS (SELECT string_split(text,' ') AS toks FROM documents),
         g AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t),
         e AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM g),
         ed AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
         nodes AS (SELECT DISTINCT w FROM
                    (SELECT w1 AS w FROM ed UNION ALL SELECT w2 FROM ed)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
         ow AS (SELECT w1, CAST(sum(c) AS BIGINT) AS outw FROM ed GROUP BY 1),
         wd AS (SELECT ed.w1, ed.w2, ed.c, ow.outw FROM ed JOIN ow ON ed.w1 = ow.w1),
         p0 AS (SELECT w, 1000000 // (SELECT n_nodes FROM nn) AS pr FROM nodes),
         s0 AS (SELECT CAST(COALESCE(sum(pr), 0) AS BIGINT) AS sp FROM p0
                WHERE w NOT IN (SELECT w1 FROM ow)),
         i1 AS (SELECT wd.w2, CAST(sum((p.pr * wd.c) // wd.outw) AS BIGINT) AS inc
                FROM wd JOIN p0 p ON wd.w1 = p.w GROUP BY 1),
         p1 AS (SELECT n.w, 150000 // (SELECT n_nodes FROM nn)
                       + (850000 * (COALESCE(i1.inc, 0)
                          + (SELECT sp FROM s0) // (SELECT n_nodes FROM nn)))
                         // 1000000 AS pr
                FROM nodes n LEFT JOIN i1 ON n.w = i1.w2),
         s1 AS (SELECT CAST(COALESCE(sum(pr), 0) AS BIGINT) AS sp FROM p1
                WHERE w NOT IN (SELECT w1 FROM ow)),
         i2 AS (SELECT wd.w2, CAST(sum((p.pr * wd.c) // wd.outw) AS BIGINT) AS inc
                FROM wd JOIN p1 p ON wd.w1 = p.w GROUP BY 1),
         p2 AS (SELECT n.w, 150000 // (SELECT n_nodes FROM nn)
                       + (850000 * (COALESCE(i2.inc, 0)
                          + (SELECT sp FROM s1) // (SELECT n_nodes FROM nn)))
                         // 1000000 AS pr
                FROM nodes n LEFT JOIN i2 ON n.w = i2.w2)
         SELECT n.w AS token, CAST(COALESCE(ow.outw, 0) AS BIGINT) AS out_w,
                CAST(p2.pr AS BIGINT) AS pr_e6
         FROM nodes n LEFT JOIN ow ON n.w = ow.w1 JOIN p2 ON n.w = p2.w
         ORDER BY token"""),

    // Q131: edit-distance-1 join via deletion neighborhoods (FastSS) —
    // the spell-variant/fuzzy-vocab matcher. Candidate pairs come from
    // an EQUI-join on single-character-deletion keys (each word emits
    // |w|+1 keys), never a cross join: a distance-1 pair always shares
    // a key (deletion → the shorter word itself; substitution → both
    // drop position i), and the exact levenshtein verify removes the
    // few untagged-key false candidates. The lexicon is the fixture
    // vocabulary plus deterministic drop-first-char / plural variants
    // (constructed identically in the oracle) so the result is
    // non-trivial.
    "q131_deletion_neighborhood" -> QuerySpec(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "").distinct()
        val lex = graft.CacheScope.persist(
          words
            .unionAll(words.filter(length(col("w")) >= 3)
              .select(col("w").substr(lit(2), length(col("w"))).as("w")))
            .unionAll(words.select(concat(col("w"), lit("s")).as("w")))
            .distinct())
        val keys = graft.CacheScope.persist(
          lex.select(col("w"), explode(
            array_union(
              array(col("w")),
              transform(sequence(lit(1), length(col("w"))),
                i => concat(
                  col("w").substr(lit(1), i - lit(1)),
                  col("w").substr(i + lit(1), length(col("w")))))))
            .as("k")))
        keys.select(col("k"), col("w").as("w1"))
          .join(keys.select(col("k"), col("w").as("w2")), "k")
          .filter(col("w1") < col("w2"))
          .select("w1", "w2")
          .distinct()
          .filter(levenshtein(col("w1"), col("w2")) <= 1)
          .select(col("w1"), col("w2"),
            levenshtein(col("w1"), col("w2")).cast("long").as("dist"))
          .orderBy("w1", "w2")
      },
      """WITH wd AS (SELECT DISTINCT w FROM
                 (SELECT unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS w
                  FROM documents)),
         lex AS (SELECT DISTINCT w FROM (
                   SELECT w FROM wd
                   UNION ALL SELECT substr(w, 2) FROM wd WHERE len(w) >= 3
                   UNION ALL SELECT w || 's' FROM wd))
         SELECT a.w AS w1, b.w AS w2, CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
         FROM lex a JOIN lex b ON a.w < b.w
         WHERE levenshtein(a.w, b.w) <= 1
         ORDER BY 1, 2"""),

    // Q188: transposition-aware typo join — q131's deletion-
    // neighborhood candidates verified with the NATIVE true
    // Damerau-Levenshtein expression (graft_damerau, Lowrance-Wagner)
    // instead of levenshtein. The lexicon adds a swap-first-two-chars
    // variant family, so the result contains pairs at DL 1 that
    // levenshtein scores 2 — the typo class (adjacent transposition)
    // plain edit-distance joins over-reject. Candidate completeness
    // is unchanged: a DL<=1 pair always shares a deletion key
    // (transposition: delete either swapped char from both sides).
    // The oracle is DuckDB's damerau_levenshtein over the same
    // lexicon, pinning the unrestricted-DL semantics end to end.
    "q188_damerau_neighbors" -> QuerySpec(
      (s, dir) => {
        val words = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "").distinct()
        val lex = graft.CacheScope.persist(
          words
            .unionAll(words.filter(length(col("w")) >= 3)
              .select(col("w").substr(lit(2), length(col("w"))).as("w")))
            .unionAll(words.filter(length(col("w")) >= 4)
              .select(concat(
                col("w").substr(lit(2), lit(1)),
                col("w").substr(lit(1), lit(1)),
                col("w").substr(lit(3), length(col("w")))).as("w")))
            .distinct())
        val keys = graft.CacheScope.persist(
          lex.select(col("w"), explode(
            array_union(
              array(col("w")),
              transform(sequence(lit(1), length(col("w"))),
                i => concat(
                  col("w").substr(lit(1), i - lit(1)),
                  col("w").substr(i + lit(1), length(col("w")))))))
            .as("k")))
        keys.select(col("k"), col("w").as("w1"))
          .join(keys.select(col("k"), col("w").as("w2")), "k")
          .filter(col("w1") < col("w2"))
          .select("w1", "w2")
          .distinct()
          .withColumn("dist", expr("graft_damerau(w1, w2)"))
          .filter(col("dist") <= 1)
          .orderBy("w1", "w2")
      },
      """WITH wd AS (SELECT DISTINCT w FROM
                 (SELECT unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS w
                  FROM documents)),
         lex AS (SELECT DISTINCT w FROM (
                   SELECT w FROM wd
                   UNION ALL SELECT substr(w, 2) FROM wd WHERE len(w) >= 3
                   UNION ALL SELECT substr(w, 2, 1) || substr(w, 1, 1) || substr(w, 3)
                   FROM wd WHERE len(w) >= 4))
         SELECT a.w AS w1, b.w AS w2,
                CAST(damerau_levenshtein(a.w, b.w) AS BIGINT) AS dist
         FROM lex a JOIN lex b ON a.w < b.w
         WHERE damerau_levenshtein(a.w, b.w) <= 1
         ORDER BY 1, 2"""),

    // Q189: hop-bounded weighted shortest paths (distributed
    // Bellman-Ford) on the trade graph — nodes are nations, edge
    // (customer nation -> supplier nation) weighted by the cheapest
    // line item shipped along that trade lane, source = nation 0,
    // 3 relaxation rounds. Each round is one equi-join on the edge
    // src key + one min-aggregate (min-plus product); the oracle
    // unrolls the same three rounds as CTEs, so the gate pins the
    // exact fixpoint-prefix semantics, not just connectivity
    // (contrast q123's unweighted BFS hops). The weighted-min edge
    // build aggregates the fact once; the iteration never touches
    // fact rows again.
    "q189_shortest_path" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val su = Tables.supplier(s, dir)
        // persist the (nations²-bounded) edge relation: every
        // relaxation round joins it, and without the cut each round
        // re-derived the 4-table fact join (the q205 fix, r19 here)
        val edges = graft.CacheScope.persist(li
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .groupBy(
            col("c_nationkey").cast("long").as("src"),
            col("s_nationkey").cast("long").as("dst"))
          .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("w")))
        graft.analytics.ShortestPath.boundedMinPlus(edges, 0L, 3)
          .orderBy("node")
      },
      """WITH e AS (SELECT CAST(c.c_nationkey AS BIGINT) AS src,
                           CAST(s.s_nationkey AS BIGINT) AS dst,
                           min(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS w
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey
                    JOIN customer c ON o.o_custkey = c.c_custkey
                    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    GROUP BY 1, 2),
         d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
         d1 AS (SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d0
                  UNION ALL
                  SELECT e.dst, d0.dist + e.w FROM d0 JOIN e ON e.src = d0.node)
                GROUP BY 1),
         d2 AS (SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d1
                  UNION ALL
                  SELECT e.dst, d1.dist + e.w FROM d1 JOIN e ON e.src = d1.node)
                GROUP BY 1),
         d3 AS (SELECT node, min(dist) AS dist FROM (
                  SELECT node, dist FROM d2
                  UNION ALL
                  SELECT e.dst, d2.dist + e.w FROM d2 JOIN e ON e.src = d2.node)
                GROUP BY 1)
         SELECT node, dist FROM d3 ORDER BY node"""),

    // Q132: explicit GROUPING SETS with grouping() disambiguation —
    // the third grouping-sets surface next to CUBE (q102) and ROLLUP
    // (q89): three hand-picked sets in ONE aggregate pass (the planner
    // expands sets map-side, no per-set rescan), with grouping() flags
    // telling a subtotal NULL from a data NULL.
    "q132_grouping_sets" -> QuerySpec(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_linestatus"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_term"))
          .createOrReplaceTempView("g_li_gs")
        s.sql(
          """SELECT coalesce(l_returnflag, 'ALL') AS rf,
                    coalesce(l_linestatus, 'ALL') AS ls,
                    cast(grouping(l_returnflag) AS bigint) AS g_rf,
                    cast(grouping(l_linestatus) AS bigint) AS g_ls,
                    count(*) AS cnt, sum(rev_term) AS rev_e4
             FROM g_li_gs
             GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                     (l_returnflag, l_linestatus))
             ORDER BY rf, ls""")
      },
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT)))
                     AS BIGINT) AS rev_e4
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus))
         ORDER BY rf, ls"""),

    // Q133: forward fill (last observation carried forward) — each
    // user's hourly value grid with gaps filled from the most recent
    // observed hour: `last(v, ignoreNulls)` over an unbounded-preceding
    // row frame, the canonical LOCF window (q59's resample zero-fills;
    // this carries state forward). One user-keyed shuffle; hours before
    // a user's first observation stay NULL by contract in both engines.
    "q133_forward_fill" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("user_id") < 30)
          .select(col("user_id"),
            expr("unix_micros(ts) div 3600000000").as("hour"),
            round(col("value") * 100).cast("long").as("v_e2"))
        val hourly = ev.groupBy("user_id", "hour").agg(max("v_e2").as("v"))
        val span = ev.agg(min("hour").as("lo"), max("hour").as("hi"))
        val grid = span
          .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
          .crossJoin(ev.select("user_id").distinct())
        val w = Window.partitionBy("user_id").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hour"), "left")
          .select(col("user_id"), col("hour"),
            last(col("v"), ignoreNulls = true).over(w).as("v_locf"),
            col("v").isNotNull.as("observed"))
          .orderBy("user_id", "hour")
      },
      """WITH e AS (SELECT user_id,
                           CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
                           CAST(round(value * 100) AS BIGINT) AS v_e2
                    FROM events WHERE user_id < 30),
         hourly AS (SELECT user_id, hour, max(v_e2) AS v FROM e GROUP BY 1, 2),
         span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM e),
         grid AS (SELECT u.user_id, h.hour
                  FROM (SELECT DISTINCT user_id FROM e) u
                  CROSS JOIN (SELECT unnest(generate_series(
                                (SELECT lo FROM span), (SELECT hi FROM span)))
                              AS hour) h)
         SELECT g.user_id, g.hour,
                last_value(hourly.v IGNORE NULLS) OVER
                  (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
                (hourly.v IS NOT NULL) AS observed
         FROM grid g LEFT JOIN hourly
              ON g.user_id = hourly.user_id AND g.hour = hourly.hour
         ORDER BY g.user_id, g.hour""")
  ) ++ layoutSpecs

  /** Source-layout gates (q134/q135): hive-partitioned writes with
    * partition pruning, and schema-evolution reads. Split out only so
    * the big specs map stays under the compiler's method-size comfort
    * (lazy: referenced from `specs` above its declaration point).
    */
  private lazy val layoutSpecs: Map[String, QuerySpec] = Map(

    // Q134: hive-partitioned layout + partition pruning — write the
    // documents partitioned by lang, read back with a lang predicate:
    // the filter must resolve at PLANNING time against the directory
    // tree (PartitionFilters, zero non-matching files opened — the
    // mechanism partition-date pruning relies on at 100 TB). The spec
    // asserts the pruned plan; this gate pins the result.
    "q134_partition_pruning" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q134").toString + "/docs_by_lang"
        val docs = Tables.documents(s, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("lang") === "en")
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents WHERE lang = 'en' ORDER BY doc_id"""),

    // Q135: schema-evolution read (mergeSchema) — two writer
    // generations with different columns land in one dataset; the
    // merged read unions the schemas and nulls the absent columns per
    // file, the ingest contract under schema drift. The oracle
    // recomputes the same union from the base table.
    "q135_schema_evolution" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q135").toString + "/docs_evolving"
        val docs = Tables.documents(s, dir)
        docs.filter(col("doc_id") < 250).select("doc_id", "text")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/gen=1")
        docs.filter(col("doc_id") >= 250).select("doc_id", "text", "lang")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/gen=2")
        s.read.option("mergeSchema", "true").parquet(tmp)
          .select("doc_id", "text", "lang", "gen")
          .orderBy("doc_id")
      },
      """SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang, 1 AS gen
         FROM documents WHERE doc_id < 250
         UNION ALL
         SELECT doc_id, text, lang, 2 AS gen
         FROM documents WHERE doc_id >= 250
         ORDER BY doc_id"""),

    // Q136: exact grid quantiles — p50/p95 per event type from the
    // distinct-value grid (one count shuffle + per-group cumulative
    // walk), the memory-bounded swap for `percentile()` whose buffers
    // hold every raw value per group. Type-1 ("lower") definition in
    // pure BIGINT predicates; the oracle replicates the definition, so
    // the gate proves the distributed grid plan computes it.
    "q136_grid_quantiles" -> QuerySpec(
      (s, dir) =>
        GridQuantiles.exact(
          Tables.events(s, dir).select(
            col("event_type"), round(col("value") * 100).cast("long").as("v_e2")),
          col("event_type"), col("v_e2"),
          Seq("p50_e2" -> ((1, 2)), "p95_e2" -> ((19, 20))))
          .orderBy("g"),
      """WITH e AS (SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS v
                    FROM events WHERE value IS NOT NULL),
         grid AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
         cum AS (SELECT g, v,
                        CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
                 FROM grid),
         tot AS (SELECT g, CAST(max(cum) AS BIGINT) AS n FROM cum GROUP BY 1),
         p50 AS (SELECT c.g, min(c.v) AS p50_e2 FROM cum c JOIN tot t ON c.g = t.g
                 WHERE c.cum * 2 >= t.n * 1 GROUP BY 1),
         p95 AS (SELECT c.g, min(c.v) AS p95_e2 FROM cum c JOIN tot t ON c.g = t.g
                 WHERE c.cum * 20 >= t.n * 19 GROUP BY 1)
         SELECT t.g, t.n, p50.p50_e2, p95.p95_e2
         FROM tot t JOIN p50 ON t.g = p50.g JOIN p95 ON t.g = p95.g
         ORDER BY t.g"""),

    // Q138: TPC-H Q6 shape (forecast revenue change) — the
    // predicate-pushdown aggregate: the date window (unwrapped from
    // `to_date` to raw timestamp bounds by the optimizer), the quantity
    // cap, and a raw-column discount range all reach the parquet scan
    // as PushedFilters so row-group stats can prune; the EXACT e2
    // discount band (`round(l_discount*100) BETWEEN 5 AND 7`) wraps the
    // column and therefore evaluates post-scan — the raw range is a
    // deliberately slack superset of it ([0.0449, 0.0751] ⊇
    // round⁻¹([5,7]) with margin for the float boundary), so adding it
    // cannot change the result, only skip row groups. What survives is
    // one map-side-combined global sum: no join, no wide shuffle — the
    // canonical "scan efficiency is the whole query" shape.
    "q138_forecast_revenue" -> QuerySpec(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(to_date(col("l_shipdate")) >= to_date(lit("1996-01-01"))
            && to_date(col("l_shipdate")) < to_date(lit("1997-01-01"))
            && col("l_discount") > 0.0449 && col("l_discount") < 0.0751
            && round(col("l_discount") * 100).cast("long").between(5, 7)
            && col("l_quantity") < 24)
          .select((round(col("l_extendedprice") * 100).cast("long")
            * round(col("l_discount") * 100).cast("long")).as("rev_term"))
          .agg(count(lit(1)).as("cnt"), sum(col("rev_term")).as("rev_e4")),
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS rev_e4
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
           AND l_quantity < 24""")
  )

  /** Canonical (u < v, deduplicated, loop-free) undirected edge list of
    * the documents' bigram graph — shared by the graph gates.
    */
  private[queries] def bigramCanonicalEdges(
      s: org.apache.spark.sql.SparkSession, dir: String) =
    TokenGraph.bigramEdges(Tables.documents(s, dir), col("text"))
      .filter(col("w1") =!= col("w2"))
      .select(least(col("w1"), col("w2")).as("u"),
        greatest(col("w1"), col("w2")).as("v"))
      .distinct()
}
