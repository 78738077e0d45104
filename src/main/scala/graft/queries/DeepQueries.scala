package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.{Ewma, Scd, SkewedAgg, Stats, ZOrder}
import graft.llm.{PassageDedup, TokenGraph}

/** Round-6 depth operators, gated: corpus-wide passage dedup, CUBE
  * grouping sets, the ORC source/sink pair, skew-replicated joins,
  * bit-exact EWMA, SCD Type-2 builds, Z-order layout profiling, the
  * correlated-subquery and set-operator SQL surfaces, exact Pearson
  * correlation, integer PageRank, and RANGE-frame windows. Oracles
  * follow the determinism recipes (portable hash, integral `div` on
  * nonnegative operands, pinned-order IEEE expressions, dyadic
  * halving).
  */
object DeepQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q101: corpus-wide passage dedup (C4/RefinedWeb line dedup with an
    // n-token window as the line unit): passages occurring in more than
    // one place anywhere in the corpus are removed from every document,
    // survivors reassembled in order. One count shuffle + one equi-join
    // + one regroup; the passage relation is persisted once for its two
    // consumers.
    "q101_passage_dedup" -> QuerySpec(
      (s, dir) =>
        PassageDedup.dedup(Tables.documents(s, dir),
          col("doc_id"), col("text"), n = 3, maxOccur = 1L)
          .orderBy("doc_id"),
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         g AS (SELECT doc_id, i,
                      array_to_string(list_slice(toks, 1 + (i-1)*3, i*3), ' ') AS passage
               FROM (SELECT doc_id, toks,
                            unnest(generate_series(1, len(toks) // 3)) AS i FROM t)),
         c AS (SELECT passage, count(*) AS occ FROM g GROUP BY 1),
         k AS (SELECT g.doc_id, g.i, g.passage
               FROM g JOIN c ON g.passage = c.passage WHERE c.occ <= 1),
         r AS (SELECT doc_id, string_agg(passage, ' ' ORDER BY i) AS new_text,
                      CAST(count(*) AS BIGINT) AS n_kept
               FROM k GROUP BY 1)
         SELECT d.doc_id, COALESCE(r.new_text, '') AS new_text,
                COALESCE(r.n_kept, 0) AS n_kept
         FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
         ORDER BY d.doc_id"""),

    // Q102: CUBE grouping sets — all four (returnflag × linestatus)
    // subtotal combinations in ONE aggregate pass (the planner expands
    // the grouping sets map-side; no per-set rescan). Money quantized
    // per row before the sum, so every cell is engine-exact.
    "q102_cube_revenue" -> QuerySpec(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_linestatus"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_term"))
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), sum(col("rev_term")).as("rev_e4"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("cnt"), col("rev_e4"))
          .orderBy("rf", "ls"),
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT)))
                     AS BIGINT) AS rev_e4
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY rf, ls"""),

    // Q103: ORC sink→source roundtrip — the third columnar format pair
    // next to JSONL (q83) and CSV (q84): write the documents table as
    // ORC, read it back, require bit-exact equality against the parquet
    // original.
    "q103_orc_roundtrip" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q103").toString + "/docs_orc"
        val docs = Tables.documents(s, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        docs.coalesce(4).write.mode("overwrite").orc(tmp)
        s.read.schema(docs.schema).orc(tmp).orderBy("doc_id")
      },
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id"""),

    // Q104: skew-replicated ("salted") join — the fact side carries a
    // deterministic salt, the dim side is exploded 8×, and the join key
    // becomes (suppkey, salt): a hot supplier spreads over 8 reducers.
    // The oracle is the PLAIN join — salting must be invisible in the
    // result.
    "q104_salted_join" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity") * 100).cast("long").as("q_e2"))
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
        SkewedAgg.replicatedJoin(li, sup,
          col("l_suppkey"), col("s_suppkey"),
          salt = col("l_orderkey") * 31 + col("l_linenumber"), buckets = 8)
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("cnt"), sum(col("q_e2")).as("qty_e2"))
          .orderBy("s_name")
      },
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CAST(round(l.l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_e2
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY 1 ORDER BY 1"""),

    // Q105: per-user EWMA (α = 1/2) over the event stream — dyadic
    // halving makes every fold step exact-or-exactly-rounded IEEE, so
    // the Spark HOF fold hash-matches a DuckDB recursive CTE bit for
    // bit. One shuffle on the user key.
    "q105_ewma" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("v_e2"))
        Ewma.dyadic(ev, col("user_id"), col("ts"), col("v_e2"))
          .select(
            col("k").as("user_id"),
            col("n_events"),
            floor(col("ewma") * lit(10000.0)).cast("long").as("ewma_e6"))
          .orderBy("user_id")
      },
      """WITH RECURSIVE e AS (
           SELECT user_id, CAST(round(value*100) AS BIGINT) AS v_e2,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
           FROM events),
         n AS (SELECT user_id, max(rn) AS mx FROM e GROUP BY 1),
         r(user_id, rn, s) AS (
           SELECT user_id, rn, CAST(v_e2 AS DOUBLE) FROM e WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.rn, r.s/2 + CAST(e.v_e2 AS DOUBLE)/2
           FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
         SELECT r.user_id, CAST(n.mx AS BIGINT) AS n_events,
                CAST(floor(r.s * 10000) AS BIGINT) AS ewma_e6
         FROM r JOIN n ON r.user_id = n.user_id AND r.rn = n.mx
         ORDER BY r.user_id"""),

    // Q106: SCD Type-2 dimension build — collapse each user's
    // consecutive same-type runs into validity intervals
    // [valid_from, valid_to) with an is_current flag. Gaps-and-islands
    // over one (key, time) sort; event_id breaks would-be ties.
    "q106_scd2" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Scd.type2(ev, col("user_id"), col("ts"), col("event_type"), col("event_id"))
          .select(
            col("k").as("user_id"), col("run"),
            col("a").as("event_type"),
            unix_micros(col("valid_from")).as("from_us"),
            coalesce(unix_micros(col("valid_to")), lit(-1L)).as("to_us"),
            col("n_changes"),
            when(col("is_current"), 1L).otherwise(0L).as("is_current"))
          .orderBy("user_id", "run")
      },
      """WITH b AS (SELECT user_id AS k, ts AS t, event_type AS a, event_id AS tb
                    FROM events),
         f AS (SELECT k, t, a, tb,
                 CASE WHEN lag(a) OVER w IS NULL OR lag(a) OVER w <> a
                      THEN 1 ELSE 0 END AS chg
               FROM b WINDOW w AS (PARTITION BY k ORDER BY t, tb)),
         rn AS (SELECT k, t, a,
                  CAST(sum(chg) OVER (PARTITION BY k ORDER BY t, tb) AS BIGINT) AS run
                FROM f),
         gr AS (SELECT k, run, min(a) AS a, min(t) AS valid_from,
                       CAST(count(*) AS BIGINT) AS n_changes
                FROM rn GROUP BY 1, 2)
         SELECT k AS user_id, run, a AS event_type,
                CAST(epoch_us(valid_from) AS BIGINT) AS from_us,
                COALESCE(CAST(epoch_us(lead(valid_from)
                  OVER (PARTITION BY k ORDER BY run)) AS BIGINT), -1) AS to_us,
                n_changes,
                CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY k ORDER BY run)
                          IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         FROM gr ORDER BY user_id, run"""),

    // Q107: Z-order layout profile — Morton-interleave (custkey, price)
    // and report each high-bit bucket's per-dimension min/max spread:
    // the multi-column data-skipping ranges a reader would see after a
    // Z-ordered write. The 32-term interleave is unrolled integer
    // arithmetic — whole-stage codegen, no lambda.
    "q107_zorder_layout" -> QuerySpec(
      (s, dir) =>
        ZOrder.layoutProfile(
          Tables.orders(s, dir).select(
            pmod(col("o_orderkey"), lit(65536L)).as("x"),
            pmod(round(col("o_totalprice")).cast("long"), lit(65536L)).as("y")),
          col("x"), col("y"), bucketShift = 26)
          .orderBy("zbucket"),
      """WITH b AS (SELECT o_orderkey % 65536 AS x,
                           CAST(round(o_totalprice) AS BIGINT) % 65536 AS y
                    FROM orders),
         z AS (SELECT x, y,
                 CAST(list_sum(list_transform(generate_series(0, 15),
                   i -> ((x >> i) & 1) * (1::BIGINT << (2*i))
                      + ((y >> i) & 1) * (1::BIGINT << (2*i+1)))) AS BIGINT) AS zv
               FROM b)
         SELECT zv >> 26 AS zbucket, CAST(count(*) AS BIGINT) AS cnt,
                min(x) AS x_min, max(x) AS x_max,
                min(y) AS y_min, max(y) AS y_max
         FROM z GROUP BY 1 ORDER BY 1"""),

    // Q108: correlated-subquery surface — EXISTS and NOT EXISTS through
    // `spark.sql`, planned as a semi-join plus an anti-join (no
    // per-row subquery execution).
    "q108_exists_sql" -> QuerySpec(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("g_customer")
        Tables.orders(s, dir).createOrReplaceTempView("g_orders")
        s.sql(
          """SELECT c.c_custkey, c.c_name FROM g_customer c
             WHERE EXISTS (SELECT 1 FROM g_orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'O')
               AND NOT EXISTS (SELECT 1 FROM g_orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_totalprice > 400000)
             ORDER BY c.c_custkey""")
      },
      """SELECT c.c_custkey, c.c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderstatus = 'O')
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_totalprice > 400000)
         ORDER BY c.c_custkey"""),

    // Q109: set-operator surface — INTERSECT and EXCEPT with their
    // standard distinct semantics (planned as aggregate + semi/anti
    // joins, not row-by-row set state).
    "q109_set_ops" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.filter(col("event_type") === "click").select("user_id")
          .intersect(
            ev.filter(col("event_type") === "purchase").select("user_id"))
          .except(ev.filter(col("value") > 450).select("user_id"))
          .orderBy("user_id")
      },
      """(SELECT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')
         EXCEPT
         SELECT user_id FROM events WHERE value > 450
         ORDER BY user_id"""),

    // Q110: exact Pearson correlation per group — five integer power
    // sums (order-free BIGINT addition) + ONE pinned double expression;
    // engine-native corr() accumulates doubles in partition order and
    // can never gate. Emits the sums so the intermediate state is
    // pinned too.
    "q110_exact_corr" -> QuerySpec(
      (s, dir) =>
        Stats.corrE6(
          Tables.lineitem(s, dir).select(
            col("l_returnflag"),
            round(col("l_quantity") * 100).cast("long").as("x"),
            round(col("l_discount") * 100).cast("long").as("y")),
          col("l_returnflag"), col("x"), col("y"))
          .orderBy("g"),
      """WITH q AS (SELECT l_returnflag AS g,
                           CAST(round(l_quantity*100) AS BIGINT) AS x,
                           CAST(round(l_discount*100) AS BIGINT) AS y
                    FROM lineitem),
         s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*y) AS BIGINT) AS sxy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(y*y) AS BIGINT) AS syy
               FROM q GROUP BY 1)
         SELECT g, n, sx, sy,
                CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
                  CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
                    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                       * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
                    * 1000000.0) AS BIGINT) END AS corr_e6
         FROM s ORDER BY g"""),

    // Q111: integer PageRank over the token-bigram digraph (TextRank
    // centrality) — three unrolled damping-0.85 rounds in ppm with
    // integral division throughout (nonnegative operands, so Spark
    // `div` == DuckDB `//`). Edge list persisted once; each round is a
    // vocabulary-sized join, never corpus-sized.
    "q111_pagerank" -> QuerySpec(
      (s, dir) =>
        TokenGraph.pagerankE6(s, Tables.documents(s, dir), col("text"), iters = 3)
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
         i1 AS (SELECT wd.w2, CAST(sum((p.pr * wd.c) // wd.outw) AS BIGINT) AS inc
                FROM wd JOIN p0 p ON wd.w1 = p.w GROUP BY 1),
         p1 AS (SELECT n.w, 150000 // (SELECT n_nodes FROM nn)
                       + (850000 * COALESCE(i1.inc, 0)) // 1000000 AS pr
                FROM nodes n LEFT JOIN i1 ON n.w = i1.w2),
         i2 AS (SELECT wd.w2, CAST(sum((p.pr * wd.c) // wd.outw) AS BIGINT) AS inc
                FROM wd JOIN p1 p ON wd.w1 = p.w GROUP BY 1),
         p2 AS (SELECT n.w, 150000 // (SELECT n_nodes FROM nn)
                       + (850000 * COALESCE(i2.inc, 0)) // 1000000 AS pr
                FROM nodes n LEFT JOIN i2 ON n.w = i2.w2),
         i3 AS (SELECT wd.w2, CAST(sum((p.pr * wd.c) // wd.outw) AS BIGINT) AS inc
                FROM wd JOIN p2 p ON wd.w1 = p.w GROUP BY 1),
         p3 AS (SELECT n.w, 150000 // (SELECT n_nodes FROM nn)
                       + (850000 * COALESCE(i3.inc, 0)) // 1000000 AS pr
                FROM nodes n LEFT JOIN i3 ON n.w = i3.w2)
         SELECT n.w AS token, CAST(COALESCE(ow.outw, 0) AS BIGINT) AS out_w,
                CAST(p3.pr AS BIGINT) AS pr_e6
         FROM nodes n LEFT JOIN ow ON n.w = ow.w1 JOIN p3 ON n.w = p3.w
         ORDER BY token"""),

    // Q112: RANGE-frame window — each event's trailing-hour count and
    // sum over a value range on epoch seconds (not a row count): the
    // frame a rows-based window cannot express. Peers at equal
    // timestamps share one frame in both engines, so ties are safe.
    "q112_range_frame" -> QuerySpec(
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          col("event_id"), col("user_id"),
          expr("unix_micros(ts) div 1000000").as("ep"),
          round(col("value") * 100).cast("long").as("v_e2"))
        val w = Window.partitionBy("user_id").orderBy("ep").rangeBetween(-3600, 0)
        e.select(
          col("event_id"), col("user_id"), col("ep"),
          count(lit(1)).over(w).cast("bigint").as("cnt_1h"),
          sum(col("v_e2")).over(w).as("sum_e2_1h"))
          .orderBy("user_id", "ep", "event_id")
      },
      """WITH e AS (SELECT event_id, user_id,
                           CAST(epoch_us(ts) AS BIGINT) // 1000000 AS ep,
                           CAST(round(value*100) AS BIGINT) AS v_e2
                    FROM events)
         SELECT event_id, user_id, ep,
                CAST(count(*) OVER w AS BIGINT) AS cnt_1h,
                CAST(sum(v_e2) OVER w AS BIGINT) AS sum_e2_1h
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep
                             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ep, event_id"""),

    // Q113: TPC-H Q3 shape (shipping priority) — selective dimension
    // filter broadcast against the fact-fact join, top-10 by quantized
    // revenue with a pinned tie-break. Both date filters reach the
    // parquet scans as pushed predicates.
    "q113_shipping_priority" -> QuerySpec(
      (s, dir) => {
        val cut = to_date(lit("1998-03-15"))
        val li = Tables.lineitem(s, dir)
          .filter(to_date(col("l_shipdate")) > cut)
          .select(col("l_orderkey"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_term"))
        val o = Tables.orders(s, dir)
          .filter(to_date(col("o_orderdate")) < cut)
          .select(col("o_orderkey"), col("o_custkey"),
            expr("unix_micros(cast(o_orderdate as timestamp))").as("odate_us"),
            col("o_orderpriority"))
        val c = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("odate_us"), col("o_orderpriority"))
          .agg(sum(col("rev_term")).as("rev_e4"))
          .select("l_orderkey", "rev_e4", "odate_us", "o_orderpriority")
          .orderBy(desc("rev_e4"), col("l_orderkey"))
          .limit(10)
      },
      """SELECT l.l_orderkey,
                CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                     AS BIGINT) AS rev_e4,
                CAST(epoch_us(o.o_orderdate) AS BIGINT) AS odate_us,
                o.o_orderpriority
         FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
           AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
         GROUP BY 1, 3, 4 ORDER BY rev_e4 DESC, l_orderkey LIMIT 10"""),

    // Q114: TPC-H Q5 shape (local supplier volume) — a 6-way star join:
    // the one fact-fact shuffle (lineitem ⋈ orders) plus four broadcast
    // dimensions; the customer=supplier nation equality rides the
    // supplier broadcast, and the region filter prunes via the tiny
    // nation→region maps before any fact row moves.
    "q114_local_volume" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_term"))
        val o = Tables.orders(s, dir)
          .filter(to_date(col("o_orderdate")) >= to_date(lit("1996-01-01"))
            && to_date(col("o_orderdate")) < to_date(lit("1997-01-01")))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        val asianNations = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey")
              && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(asianNations), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_term")).as("rev_e4"))
          .orderBy(desc("rev_e4"), col("n_name"))
      },
      """SELECT n.n_name,
                CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                     AS BIGINT) AS rev_e4
         FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
                             AND c.c_nationkey = s.s_nationkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region rg ON n.n_regionkey = rg.r_regionkey
         WHERE rg.r_name = 'ASIA'
           AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
         GROUP BY 1 ORDER BY rev_e4 DESC, n_name"""),

    // Q115: JSON key-shape profile — which keys appear in the props
    // payload, per event type: the schema-drift monitor for a
    // semi-structured column. `json_object_keys` + explode is map-side;
    // one tiny count shuffle.
    "q115_json_keys" -> QuerySpec(
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            explode(expr("json_object_keys(props)")).as("key"))
          .groupBy(col("event_type"), col("key"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("event_type", "key"),
      """WITH k AS (SELECT event_type, unnest(json_keys(props)) AS key FROM events)
         SELECT event_type, key, CAST(count(*) AS BIGINT) AS cnt
         FROM k GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q116: robust statistics — median absolute deviation per group,
    // two exact-percentile passes (medians interpolate on half-integers:
    // dyadic, so the doubles match bit-for-bit; q60 recipe applied
    // twice). The per-group median rides back on a broadcast join.
    "q116_mad_robust" -> QuerySpec(
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          col("event_type"), round(col("value") * 100).cast("long").as("v_e2"))
        val med = e.groupBy("event_type")
          .agg(expr("percentile(v_e2, 0.5)").as("med"))
        e.join(broadcast(med), "event_type")
          .select(col("event_type"),
            abs(col("v_e2").cast("double") - col("med")).as("adev"), col("med"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("cnt"),
            floor(min(col("med")) * 100).cast("long").as("med_e4"),
            floor(expr("percentile(adev, 0.5)") * 100).cast("long").as("mad_e4"))
          .orderBy("event_type")
      },
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v_e2
                    FROM events),
         m AS (SELECT event_type, quantile_cont(v_e2, 0.5) AS med FROM e GROUP BY 1),
         d AS (SELECT e.event_type, abs(CAST(e.v_e2 AS DOUBLE) - m.med) AS adev,
                      m.med
               FROM e JOIN m ON e.event_type = m.event_type)
         SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                CAST(floor(min(med) * 100) AS BIGINT) AS med_e4,
                CAST(floor(quantile_cont(adev, 0.5) * 100) AS BIGINT) AS mad_e4
         FROM d GROUP BY 1 ORDER BY 1"""),

    // Q117: winsorization — clip each group's values at its own
    // p05/p95 before aggregating (the outlier-robust cleaning step of
    // feature prep). Quantile bounds are floored into a 2× integer
    // domain so the clipped sum stays order-free BIGINT arithmetic;
    // the bounds ride back on a broadcast join.
    "q117_winsorize" -> QuerySpec(
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          col("event_type"), round(col("value") * 100).cast("long").as("v_e2"))
        val p = e.groupBy("event_type").agg(
          floor(expr("percentile(v_e2, 0.05)") * 2).cast("long").as("lo2"),
          floor(expr("percentile(v_e2, 0.95)") * 2).cast("long").as("hi2"))
        val v2 = col("v_e2") * 2
        e.join(broadcast(p), "event_type")
          .select(col("event_type"), col("v_e2"), col("lo2"), col("hi2"),
            when(v2 < col("lo2"), col("lo2"))
              .when(v2 > col("hi2"), col("hi2"))
              .otherwise(v2).as("w2"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("cnt"),
            sum(when(v2 < col("lo2"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(v2 > col("hi2"), 1L).otherwise(0L)).as("n_hi"),
            min(col("lo2")).as("lo2"), min(col("hi2")).as("hi2"),
            sum(col("w2")).as("wsum_2e2"))
          .orderBy("event_type")
      },
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v_e2
                    FROM events),
         p AS (SELECT event_type,
                      CAST(floor(quantile_cont(v_e2, 0.05) * 2) AS BIGINT) AS lo2,
                      CAST(floor(quantile_cont(v_e2, 0.95) * 2) AS BIGINT) AS hi2
               FROM e GROUP BY 1),
         c AS (SELECT e.event_type, e.v_e2, p.lo2, p.hi2,
                      CASE WHEN 2*e.v_e2 < p.lo2 THEN p.lo2
                           WHEN 2*e.v_e2 > p.hi2 THEN p.hi2
                           ELSE 2*e.v_e2 END AS w2
               FROM e JOIN p ON e.event_type = p.event_type)
         SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CASE WHEN 2*v_e2 < lo2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
                CAST(sum(CASE WHEN 2*v_e2 > hi2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
                min(lo2) AS lo2, min(hi2) AS hi2,
                CAST(sum(w2) AS BIGINT) AS wsum_2e2
         FROM c GROUP BY 1 ORDER BY 1"""),

    // Q118: Gini diversity of each source's language mix — the
    // log-free diversity index (1 − Σp²), exact in integral ppm (no
    // entropy/ln, which libm would make engine-specific). Two tiny
    // map-side-combined aggregates.
    "q118_gini_diversity" -> QuerySpec(
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("tot"), sum(col("c") * col("c")).as("ss"))
          .select(col("source"), col("tot"),
            expr("1000000L - (1000000L * ss) div (tot * tot)").as("gini_e6"))
          .orderBy("source"),
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
                    FROM documents GROUP BY 1, 2),
         t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot,
                      CAST(sum(c*c) AS BIGINT) AS ss
               FROM c GROUP BY 1)
         SELECT source, tot,
                CAST(1000000 - (1000000 * ss) // (tot * tot) AS BIGINT) AS gini_e6
         FROM t ORDER BY source"""),

    // Q119: triangle counting on the (undirected, deduplicated) bigram
    // graph — the clustering-coefficient primitive, via the
    // degree-oriented wedge join (analytics/Triangles.scala): every
    // node's wedge fan-out is bounded by sqrt(|E|) even on power-law
    // hubs, where the earlier u<v name orientation was hub-degree-
    // quadratic. The count is orientation-invariant, so the oracle is
    // unchanged.
    "q119_triangles" -> QuerySpec(
      (s, dir) => {
        val bg = graft.llm.TokenGraph.bigramEdges(
          Tables.documents(s, dir), col("text"))
        val e = bg.filter(col("w1") =!= col("w2"))
          .select(least(col("w1"), col("w2")).as("u"),
            greatest(col("w1"), col("w2")).as("v"))
          .distinct()
        graft.analytics.Triangles.countTriangles(e, col("u"), col("v"))
      },
      """WITH t AS (SELECT string_split(text,' ') AS toks FROM documents),
         g AS (SELECT toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t),
         b AS (SELECT toks[i] AS wa, toks[i+1] AS wb FROM g),
         e AS (SELECT DISTINCT least(wa, wb) AS u, greatest(wa, wb) AS v
               FROM b WHERE wa <> wb),
         tr AS (SELECT e1.u AS a, e1.v AS b2, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
                          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
         SELECT CAST(count(*) AS BIGINT) AS n_triangles,
                CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges
         FROM tr""")
  )
}
