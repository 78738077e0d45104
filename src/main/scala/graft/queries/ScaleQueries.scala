package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.analytics.{CdcMerge, Histogram}
import graft.llm.{Curation, Similarity, TextHash, Vocabulary}
import graft.sources.BucketedTables

/** Round-6 extension operators, gated: distribution profiling, Zipf
  * coverage, PMI collocations, prefix dedup, token-budget mixing,
  * two-stage ANN rerank, CDC apply-changes, bucketed co-located joins,
  * and inverted-index construction. Oracles follow the determinism
  * recipes (portable 60-bit md5 hash, integral `div`, pinned-order
  * IEEE double expressions — no libm beyond correctly-rounded sqrt).
  */
object ScaleQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q68: equi-width length histogram — the profiling primitive behind
    // distribution reports. One map-side bucket projection + one tiny
    // hash aggregate; integral bucket math (no float edge drift).
    "q68_length_histogram" -> QuerySpec(
      (s, dir) =>
        Histogram.equiWidth(Tables.documents(s, dir), col("n_chars"), 100L)
          .orderBy("bucket"),
      """SELECT n_chars // 100 AS bucket,
                (n_chars // 100) * 100 AS lo,
                (n_chars // 100) * 100 + 100 AS hi,
                count(*) AS cnt,
                min(n_chars) AS v_min,
                max(n_chars) AS v_max
         FROM documents GROUP BY 1, 2, 3 ORDER BY 1"""),

    // Q69: Zipf coverage curve — what share of all tokens the top-100
    // tokens explain (the tokenizer-budget question). Token shuffle
    // with map-side combine, TakeOrdered top-k, then a 100-row window;
    // coverage is integral parts-per-million.
    "q69_zipf_coverage" -> QuerySpec(
      (s, dir) =>
        Vocabulary.zipfCoverage(Tables.documents(s, dir), col("text"), 100)
          .orderBy("rank"),
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1),
         r AS (SELECT token, cnt,
                      row_number() OVER (ORDER BY cnt DESC, token) AS rank
               FROM c),
         f AS (SELECT * FROM r WHERE rank <= 100)
         SELECT rank, token, cnt,
                CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_cnt,
                (CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) * 1000000)
                  // (SELECT count(*) FROM t) AS coverage_e6
         FROM f ORDER BY rank"""),

    // Q70: PMI collocation mining — top-50 bigrams by the log-free PMI
    // rational (c_xy·N_uni²)/(N_big·c_x·c_y), floored to e6. The double
    // expression's operation order is pinned identically in both
    // engines (IEEE multiply/divide are exactly rounded, so the bits
    // match). Pair and unigram counts are map-side-combined shuffles;
    // the count joins are vocabulary-sized.
    "q70_pmi_bigrams" -> QuerySpec(
      (s, dir) =>
        Vocabulary.pmiBigrams(Tables.documents(s, dir), col("text"),
          minCount = 5L, k = 50)
          .orderBy("rank"),
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         u AS (SELECT unnest(toks) AS w FROM t),
         cu AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
         g AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
         p AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM g),
         cb AS (SELECT w1, w2, count(*) AS c_xy FROM p
                GROUP BY 1, 2 HAVING count(*) >= 5),
         s AS (SELECT cb.w1, cb.w2, cb.c_xy,
                 CAST(floor((CAST(cb.c_xy AS DOUBLE)
                   * (SELECT count(*) FROM u) * (SELECT count(*) FROM u)
                   / (CAST((SELECT count(*) FROM p) AS DOUBLE) * u1.c * u2.c))
                   * 1000000.0) AS BIGINT) AS score_e6
               FROM cb JOIN cu u1 ON cb.w1 = u1.w
                       JOIN cu u2 ON cb.w2 = u2.w),
         r AS (SELECT w1, w2, c_xy, score_e6,
                      row_number() OVER (ORDER BY score_e6 DESC, w1, w2) AS rank
               FROM s)
         SELECT w1, w2, c_xy, score_e6, rank FROM r
         WHERE rank <= 50 ORDER BY rank"""),

    // Q71: prefix dedup — near-identical documents that share their
    // first 256 chars (same article, different footer) collapse to the
    // smallest doc id; group_size records the collapse factor. One
    // shuffle on the 8-byte prefix key.
    "q71_prefix_dedup" -> QuerySpec(
      (s, dir) => {
        val keyed = Tables.documents(s, dir).select(
          col("doc_id"),
          TextHash.hash60(substring(col("text"), 1, 256)).as("prefix_key"))
        val w = Window.partitionBy("prefix_key")
        keyed
          .withColumn("group_size", count(lit(1)).over(w).cast("bigint"))
          .withColumn("__rn", row_number().over(w.orderBy("doc_id")))
          .filter(col("__rn") === 1)
          .select("doc_id", "prefix_key", "group_size")
          .orderBy("doc_id")
      },
      """WITH k AS (SELECT doc_id,
                ('0x' || substr(md5(substr(text, 1, 256)), 1, 15))::BIGINT
                  AS prefix_key
              FROM documents)
         SELECT doc_id, prefix_key,
                CAST(count(*) OVER (PARTITION BY prefix_key) AS BIGINT)
                  AS group_size
         FROM k
         QUALIFY row_number() OVER (PARTITION BY prefix_key ORDER BY doc_id) = 1
         ORDER BY doc_id"""),

    // Q72: token-budget mixing — admit documents per language, in
    // portable-hash order, until each language's token budget is
    // reached (the data-mixing step of corpus assembly). One stratum
    // shuffle; the admission decision is reproducible anywhere.
    "q72_token_budget" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(
          col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        Curation.tokenBudgetSample(docs, col("lang"), col("doc_id"), col("n_tok"),
          Seq("en" -> 5000L, "de" -> 2000L, "es" -> 2000L,
            "fr" -> 2000L, "zh" -> 2000L))
          .select("doc_id", "lang", "n_tok", "cum_before")
          .orderBy("doc_id")
      },
      """WITH d AS (SELECT doc_id, lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                ('0x' || substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM documents),
         c AS (SELECT doc_id, lang, n_tok,
                 COALESCE(CAST(sum(n_tok) OVER (PARTITION BY lang
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS cum_before
               FROM d)
         SELECT doc_id, lang, n_tok, cum_before FROM c
         WHERE cum_before < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                                      WHEN 'es' THEN 2000 WHEN 'fr' THEN 2000
                                      WHEN 'zh' THEN 2000 ELSE 0 END
         ORDER BY doc_id"""),

    // Q73: two-stage ANN — int8 coarse scan keeps 50 candidates per
    // query, exact integer-cosine rerank keeps 10. Both stages are
    // WindowGroupLimit-bounded windows over a broadcast NLJ; the int8
    // code path is the memory-bandwidth saver at corpus scale.
    "q73_ann_rerank" -> QuerySpec(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.rerankTopK(
          emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5),
          "vec_id", "embedding", coarseK = 50, k = 10)
          .withColumn("rank", col("rank").cast("bigint"))
          .orderBy("query_id", "rank")
      },
      """WITH b AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS e,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
              FROM embeddings),
         sc AS (SELECT vec_id, e, xd,
                  list_max(list_transform(xd, x -> abs(x))) / 127.0 AS scale
                FROM b),
         pp AS (SELECT vec_id, e,
                  CAST(list_sum(list_transform(e, x -> x*x)) AS BIGINT) AS n,
                  list_transform(xd, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS e8
                FROM sc),
         qs AS (SELECT * FROM pp WHERE vec_id < 5),
         cs AS (SELECT * FROM pp WHERE vec_id >= 5),
         coarse AS (SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                      CAST(list_sum(list_transform(list_zip(q.e8, c.e8),
                        p -> p[1]*p[2])) AS BIGINT) AS coarse,
                      q.e AS qe, q.n AS qn, c.e AS ce, c.n AS cn
                    FROM cs c CROSS JOIN qs q),
         filt AS (SELECT * FROM coarse
                  QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY coarse DESC, candidate_id) <= 50),
         rr AS (SELECT query_id, candidate_id, coarse,
                  CAST(CAST(list_sum(list_transform(list_zip(qe, ce),
                    p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
                    / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cosine
                FROM filt),
         ranked AS (SELECT query_id, candidate_id, coarse, cosine,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, candidate_id) AS rank
                    FROM rr)
         SELECT query_id, candidate_id, coarse, rank, cosine FROM ranked
         WHERE rank <= 10 ORDER BY query_id, rank"""),

    // Q74: CDC apply-changes — a base snapshot merged with an ordered
    // changelog of upserts and deletes (last-writer-wins; a winning
    // delete removes the key). The MERGE INTO primitive of incremental
    // refresh: one key shuffle, WindowGroupLimit-bounded state.
    "q74_apply_changes" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = docs.filter(pmod(col("doc_id"), lit(10)) <= 7)
          .select(col("doc_id"), TextHash.hash60(col("text")).as("val_hash"))
        val updates = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select(col("doc_id"),
            TextHash.hash60(concat(col("text"), lit(" v2"))).as("val_hash"),
            lit(1L).as("seq"), lit(CdcMerge.OpUpsert).as("op"))
        val deletes = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), lit(null).cast("long").as("val_hash"),
            lit(2L).as("seq"), lit(CdcMerge.OpDelete).as("op"))
        CdcMerge.applyChanges(base, updates.unionByName(deletes),
          "doc_id", col("seq"), col("op"), Seq("val_hash"))
          .orderBy("doc_id")
      },
      """WITH b AS (SELECT doc_id,
                ('0x' || substr(md5(text), 1, 15))::BIGINT AS val_hash,
                0 AS seq, 'upsert' AS op
              FROM documents WHERE doc_id % 10 <= 7),
         u AS (SELECT doc_id,
                 ('0x' || substr(md5(text || ' v2'), 1, 15))::BIGINT AS val_hash,
                 1 AS seq, 'upsert' AS op
               FROM documents WHERE doc_id % 5 = 0),
         d AS (SELECT doc_id, CAST(NULL AS BIGINT) AS val_hash,
                 2 AS seq, 'delete' AS op
               FROM documents WHERE doc_id % 7 = 0),
         a AS (SELECT * FROM b UNION ALL SELECT * FROM u
               UNION ALL SELECT * FROM d),
         w AS (SELECT * FROM a
               QUALIFY row_number() OVER (PARTITION BY doc_id
                                          ORDER BY seq DESC) = 1)
         SELECT doc_id, val_hash, CAST(seq AS BIGINT) AS src_seq
         FROM w WHERE op = 'upsert' ORDER BY doc_id"""),

    // Q75: bucketed co-located join — both sides pre-bucketed on the
    // join key at write time, so the join itself needs NO exchange and
    // NO sort on either side (the amortize-the-shuffle layout for fact
    // tables joined on the same key every run). The oracle is the plain
    // join: bucketing must not change a single row.
    "q75_bucketed_join" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q75").toString
        val o = BucketedTables.ensure(s, Tables.orders(s, dir),
          "graft_orders_bkt", "o_custkey", 16, s"$tmp/orders")
        val c = BucketedTables.ensure(s, Tables.customer(s, dir),
          "graft_customer_bkt", "c_custkey", 16, s"$tmp/customer")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_nationkey").cast("bigint").as("nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_e2"))
          .orderBy("nationkey")
      },
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS total_e2
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1"""),

    // Q77: funnel analysis — users who viewed, then clicked after
    // their first view, then purchased after that click, with integral
    // per-million conversion rates. Each stage is a semi-join
    // aggregation on user_id (per-user state = one timestamp); the
    // stage-count combine is three broadcast 1-row aggregates.
    "q77_funnel" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
        // each stage feeds BOTH the next stage's join and its own count
        // — persist so neither re-aggregates the event scan per consumer
        val v = graft.CacheScope.persist(
          ev.filter(col("event_type") === "view")
            .groupBy("user_id").agg(min("ts_us").as("t_view")))
        val c = graft.CacheScope.persist(
          ev.filter(col("event_type") === "click").join(v, "user_id")
            .filter(col("ts_us") > col("t_view"))
            .groupBy("user_id").agg(min("ts_us").as("t_click")))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts_us") > col("t_click"))
          .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
        v.agg(count(lit(1)).as("view_users"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("click_users"))))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("purchase_users"))))
          .select(col("view_users"), col("click_users"), col("purchase_users"),
            expr("(click_users * 1000000L) div view_users").as("view_to_click_e6"),
            expr("(purchase_users * 1000000L) div click_users")
              .as("click_to_purchase_e6"))
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
         v AS (SELECT user_id, min(ts_us) AS t_view FROM e
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(ts_us) AS t_click FROM e JOIN v USING (user_id)
               WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
         p AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
         SELECT (SELECT count(*) FROM v) AS view_users,
                (SELECT count(*) FROM c) AS click_users,
                (SELECT count(*) FROM p) AS purchase_users,
                ((SELECT count(*) FROM c) * 1000000) // (SELECT count(*) FROM v)
                  AS view_to_click_e6,
                ((SELECT count(*) FROM p) * 1000000) // (SELECT count(*) FROM c)
                  AS click_to_purchase_e6"""),

    // Q78: cohort retention — users grouped by first-activity epoch
    // week, distinct actives per (cohort, week offset), retention as
    // parts-per-million of the cohort. Two user-keyed shuffles (first
    // activity + distinct activity), one cohort-keyed aggregate; the
    // cohort-size side of the rate join is dimension-sized and
    // broadcast.
    "q78_cohort_retention" -> QuerySpec(
      (s, dir) => {
        // ONE event scan: the distinct (user, week) active set persists
        // and the cohort assignment derives from it (min over distinct
        // weeks == min over all events)
        val act = graft.CacheScope.persist(
          Tables.events(s, dir).select(
            col("user_id"),
            expr("unix_micros(ts) div 604800000000L").as("week"))
            .distinct())
        val first = graft.CacheScope.persist(
          act.groupBy("user_id").agg(min("week").as("cohort_week")))
        val sizes = first.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
        act.join(first, "user_id")
          .groupBy(col("cohort_week"),
            (col("week") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), "cohort_week")
          .select(col("cohort_week"), col("week_offset"), col("n_active"),
            col("cohort_size"),
            expr("(n_active * 1000000L) div cohort_size").as("retention_e6"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
         f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
         sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1),
         a AS (SELECT DISTINCT user_id, week FROM w),
         g AS (SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
                      count(*) AS n_active
               FROM a JOIN f USING (user_id) GROUP BY 1, 2)
         SELECT g.cohort_week, g.week_offset, g.n_active, sz.cohort_size,
                (g.n_active * 1000000) // sz.cohort_size AS retention_e6
         FROM g JOIN sz USING (cohort_week)
         ORDER BY 1, 2"""),

    // Q79: DAU/WAU activity curve — distinct daily actives plus the
    // trailing-7-day distinct count per day. The sliding distinct is a
    // range join of the (user, day) active set against the broadcast
    // day grid (dimension-sized however large the event log), then a
    // distinct aggregate — count(DISTINCT) over a RANGE frame is not a
    // window either engine runs, so the grid formulation IS the plan.
    "q79_active_users" -> QuerySpec(
      (s, dir) => {
        // the active set feeds the grid, the DAU agg, and the WAU join
        // — persist it so the scan+distinct runs once, not three times
        val ud = graft.CacheScope.persist(
          Tables.events(s, dir).select(
            col("user_id"), expr("unix_micros(ts) div 86400000000L").as("day"))
            .distinct())
        val days = ud.select("day").distinct()
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = ud.select(col("user_id"), col("day").as("d2"))
          .join(broadcast(days), col("d2").between(col("day") - 6, col("day")))
          .groupBy("day").agg(count_distinct(col("user_id")).as("wau"))
        dau.join(wau, "day").orderBy("day")
      },
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                     FROM events),
         days AS (SELECT DISTINCT day FROM ud),
         dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
         wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau
                 FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
                 GROUP BY 1)
         SELECT dau.day, dau.dau, wau.wau
         FROM dau JOIN wau USING (day) ORDER BY 1"""),

    // Q80: daily-volume anomaly detection — per-type z-scores of daily
    // event counts, with the variance numerator kept as an EXACT
    // integer (n·Σx² − (Σx)²) so mean/std/z are the same pinned-order
    // double expression in both engines (sqrt is correctly rounded by
    // IEEE 754). Two tiny aggregates + a type-keyed broadcast join.
    "q80_daily_anomaly" -> QuerySpec(
      (s, dir) => {
        // daily feeds both the stats aggregate and the z-score join
        val daily = graft.CacheScope.persist(
          Tables.events(s, dir)
            .groupBy(col("event_type"),
              expr("unix_micros(ts) div 86400000000L").as("day"))
            .agg(count(lit(1)).as("cnt")))
        val stats = daily.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("cnt").as("sx"),
          sum(col("cnt") * col("cnt")).as("sxx"))
        daily.join(broadcast(stats), "event_type")
          .filter(col("n") > 1 && col("n") * col("sxx") - col("sx") * col("sx") > 0)
          .withColumn("z",
            (col("cnt").cast("double") - col("sx").cast("double") / col("n"))
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
                / (col("n") * (col("n") - 1))))
          .select(col("event_type"), col("day"), col("cnt"),
            floor(col("z") * 1000).cast("long").as("z_e3"),
            when(abs(col("z")) > 2.0, 1L).otherwise(0L).as("is_anomaly"))
          .orderBy("event_type", "day")
      },
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                               count(*) AS cnt
                        FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, count(*) AS n,
                       CAST(sum(cnt) AS BIGINT) AS sx,
                       CAST(sum(cnt * cnt) AS BIGINT) AS sxx
                FROM daily GROUP BY 1),
         z AS (SELECT d.event_type, d.day, d.cnt,
                 (CAST(d.cnt AS DOUBLE) - CAST(st.sx AS DOUBLE) / st.n)
                   / sqrt(CAST(st.n * st.sxx - st.sx * st.sx AS DOUBLE)
                     / (st.n * (st.n - 1))) AS z
               FROM daily d JOIN st USING (event_type)
               WHERE st.n > 1 AND st.n * st.sxx - st.sx * st.sx > 0)
         SELECT event_type, day, cnt,
                CAST(floor(z * 1000) AS BIGINT) AS z_e3,
                CAST(CASE WHEN abs(z) > 2.0 THEN 1 ELSE 0 END AS BIGINT)
                  AS is_anomaly
         FROM z ORDER BY 1, 2"""),

    // Q81: event debounce — keep only burst-starting events per
    // (user, type): an event survives iff its predecessor in the same
    // key is more than 5 minutes older (or absent). The event-stream
    // twin of dedup: one key shuffle, lag window, map-side filter.
    "q81_event_debounce" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts_us", "event_id")
        ev.withColumn("__prev", lag("ts_us", 1).over(w))
          .filter(col("__prev").isNull ||
            col("ts_us") - col("__prev") > 300000000L)
          .select("user_id", "event_type", "ts_us", "event_id")
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
                    FROM events),
         l AS (SELECT user_id, event_type, ts_us, event_id,
                      lag(ts_us) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts_us, event_id) AS prev
               FROM e)
         SELECT user_id, event_type, ts_us, event_id FROM l
         WHERE prev IS NULL OR ts_us - prev > 300000000
         ORDER BY event_id"""),

    // Q82: time-to-convert — exact p50/p95 of first-view→first-
    // purchase latency across converting users. Two semi-join stage
    // aggregations (the q77 shapes) + one exact percentile over
    // integer microseconds (the engine-shared (n−1)·q interpolation).
    "q82_time_to_convert" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
        // v feeds both the purchase-stage join and the final delta join
        val v = graft.CacheScope.persist(
          ev.filter(col("event_type") === "view")
            .groupBy("user_id").agg(min("ts_us").as("t_view")))
        val p = ev.filter(col("event_type") === "purchase").join(v, "user_id")
          .filter(col("ts_us") > col("t_view"))
          .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
        p.join(v, "user_id")
          .select((col("t_purchase") - col("t_view")).as("delta_us"))
          .agg(count(lit(1)).as("n_converted"),
            expr("percentile(delta_us, 0.5)").as("p50_delta_us"),
            expr("percentile(delta_us, 0.95)").as("p95_delta_us"))
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
         v AS (SELECT user_id, min(ts_us) AS t_view FROM e
               WHERE event_type = 'view' GROUP BY 1),
         p AS (SELECT e.user_id, min(ts_us) AS t_purchase
               FROM e JOIN v USING (user_id)
               WHERE event_type = 'purchase' AND ts_us > t_view GROUP BY 1),
         d AS (SELECT p.t_purchase - v.t_view AS delta_us
               FROM p JOIN v USING (user_id))
         SELECT count(*) AS n_converted,
                quantile_cont(delta_us, 0.5) AS p50_delta_us,
                quantile_cont(delta_us, 0.95) AS p95_delta_us
         FROM d"""),

    // Q83: JSONL sink→source roundtrip — write the documents table as
    // JSON lines, read it back with an explicit schema, and require
    // bit-exact equality against the original (the oracle reads the
    // parquet directly). Escaping, unicode, and numeric fidelity of
    // the JSON source/sink pair are what's on trial.
    "q83_jsonl_roundtrip" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q83").toString + "/docs_jsonl"
        val docs = Tables.documents(s, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        docs.coalesce(4).write.mode("overwrite").json(tmp)
        s.read.schema(docs.schema).json(tmp).orderBy("doc_id")
      },
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id"""),

    // Q84: CSV sink→source roundtrip — RFC-4180 quoting (quote-all +
    // doubled quotes, multiline read) through Spark's CSV pair, gated
    // bit-exact against the parquet original. The header carries the
    // schema names; types are pinned explicitly on read.
    "q84_csv_roundtrip" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q84").toString + "/docs_csv"
        val docs = Tables.documents(s, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        docs.coalesce(4).write.mode("overwrite")
          .option("header", "true").option("quoteAll", "true")
          .option("escape", "\"")
          .csv(tmp)
        s.read.schema(docs.schema)
          .option("header", "true").option("multiLine", "true")
          .option("escape", "\"")
          .csv(tmp)
          .orderBy("doc_id")
      },
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id"""),

    // Q86: blocked fuzzy duplicate detection — record linkage by edit
    // distance: candidate pairs come from an EQUI-join on a blocking
    // key (language × size bucket × 4-char prefix), never all-pairs;
    // the quadratic levenshtein verify runs only inside blocks, on
    // 48-char heads. The prefix component is what keeps in-block pair
    // counts sane on a big corpus (classic multi-key blocking — pairs
    // differing inside the prefix are the recall trade, recovered in
    // production by a second blocking pass on a different key). Both
    // engines implement unit-cost Levenshtein — exact integers.
    "q86_fuzzy_match" -> QuerySpec(
      (s, dir) => {
        // persisted: both sides of the blocked self-join read d
        val d = graft.CacheScope.persist(
          Tables.documents(s, dir).select(
            col("doc_id"), col("lang"), expr("n_chars div 50").as("szb"),
            substring(col("text"), 1, 4).as("pfx"),
            substring(col("text"), 1, 48).as("head")))
        val a = d.select(col("lang"), col("szb"), col("pfx"),
          col("doc_id").as("id1"), col("head").as("h1"))
        val b = d.select(col("lang"), col("szb"), col("pfx"),
          col("doc_id").as("id2"), col("head").as("h2"))
        a.join(b, Seq("lang", "szb", "pfx"))
          .filter(col("id1") < col("id2"))
          .withColumn("dist", levenshtein(col("h1"), col("h2")).cast("bigint"))
          .filter(col("dist") <= 5)
          .select("id1", "id2", "dist")
          .orderBy("id1", "id2")
      },
      """WITH d AS (SELECT doc_id, lang, n_chars // 50 AS szb,
                           substr(text, 1, 4) AS pfx,
                           substr(text, 1, 48) AS head
                    FROM documents)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
         FROM d a JOIN d b
           ON a.lang = b.lang AND a.szb = b.szb AND a.pfx = b.pfx
              AND a.doc_id < b.doc_id
         WHERE levenshtein(a.head, b.head) <= 5
         ORDER BY 1, 2"""),

    // Q87: week-over-week revenue index — weekly quantized-money sums
    // with the previous week carried by a lag window and the ratio as
    // integral ppm (nonnegative, so Spark's truncating `div` and
    // DuckDB's flooring `//` agree). One small aggregate + one
    // dimension-sized window.
    "q87_week_over_week" -> QuerySpec(
      (s, dir) => {
        val wk = Tables.orders(s, dir)
          .groupBy(expr(
            // o_orderdate is TIMESTAMP_NTZ; the session runs UTC, so the
            // cast is wall-clock identity and matches DuckDB's epoch_us
            "unix_micros(cast(o_orderdate as timestamp)) div 604800000000L")
            .as("week"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_e2"))
        wk.withColumn("prev_e2",
          lag("revenue_e2", 1).over(Window.orderBy("week")))
          .withColumn("wow_index_e6",
            expr("(revenue_e2 * 1000000L) div prev_e2"))
          .orderBy("week")
      },
      """WITH wk AS (SELECT epoch_us(o_orderdate) // 604800000000 AS week,
                            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                 AS BIGINT) AS revenue_e2
                     FROM orders GROUP BY 1),
         l AS (SELECT week, revenue_e2,
                      lag(revenue_e2) OVER (ORDER BY week) AS prev_e2
               FROM wk)
         SELECT week, revenue_e2, prev_e2,
                (revenue_e2 * 1000000) // prev_e2 AS wow_index_e6
         FROM l ORDER BY week"""),

    // Q88: unpivot/melt — the inverse of the reference's pivot family:
    // three measure columns stacked into (measure, value) rows via the
    // codegen'd `stack` generator, then profiled per measure. Map-side
    // generate + one 3-key aggregate.
    "q88_unpivot_profile" -> QuerySpec(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(expr(
            """stack(3,
                 'quantity', cast(round(l_quantity * 100) as bigint),
                 'price',    cast(round(l_extendedprice * 100) as bigint),
                 'discount', cast(round(l_discount * 100) as bigint))
               as (measure, value_e2)"""))
          .groupBy("measure")
          .agg(count(lit(1)).as("n"),
            sum("value_e2").as("sum_e2"),
            min("value_e2").as("min_e2"),
            max("value_e2").as("max_e2"))
          .orderBy("measure"),
      """WITH m AS (
           SELECT 'quantity' AS measure,
                  CAST(round(l_quantity * 100) AS BIGINT) AS value_e2
           FROM lineitem
           UNION ALL
           SELECT 'price', CAST(round(l_extendedprice * 100) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'discount', CAST(round(l_discount * 100) AS BIGINT)
           FROM lineitem)
         SELECT measure, count(*) AS n,
                CAST(sum(value_e2) AS BIGINT) AS sum_e2,
                min(value_e2) AS min_e2, max(value_e2) AS max_e2
         FROM m GROUP BY 1 ORDER BY 1"""),

    // Q89: rollup subtotals — revenue by (priority, year) with
    // per-priority subtotals and the grand total in ONE pass (rollup
    // expands grouping sets inside the aggregate; no union of
    // re-scans). Null group markers are coalesced to sentinel labels
    // so the comparator sees plain values.
    "q89_rollup_revenue" -> QuerySpec(
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup(col("o_orderpriority").as("pr0"),
            year(col("o_orderdate")).cast("bigint").as("yr0"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_e2"))
          .select(
            coalesce(col("pr0"), lit("ALL")).as("priority"),
            coalesce(col("yr0"), lit(-1L)).as("yr"),
            col("n_orders"), col("revenue_e2"))
          .orderBy("priority", "yr"),
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
                COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
                count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS revenue_e2
         FROM orders
         GROUP BY ROLLUP (o_orderpriority, year(o_orderdate))
         ORDER BY 1, 2"""),

    // Q90: JSON-path extraction over a semi-structured string column —
    // the payload-field pull every event pipeline does before it can
    // aggregate. `get_json_object` is a codegen'd map-side expression;
    // the aggregate is type-keyed and tiny.
    "q90_json_extract" -> QuerySpec(
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("k").isNull, 1L).otherwise(0L)).as("null_k"),
            sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
          .orderBy("event_type"),
      """SELECT event_type, count(*) AS n,
                CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS null_k,
                CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS sum_k,
                min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1 ORDER BY 1"""),

    // Q91: the rank-function family per language over document length —
    // rank / dense_rank / percent_rank / cume_dist are all TIE-
    // INVARIANT (they depend on the order key's value, not tie order),
    // so ordering by the non-unique length alone is deterministic and
    // the tied groups are exactly what distinguishes the four
    // functions. percent_rank's (rank−1)/(n−1) and cume_dist's
    // peers/n are the same IEEE division in both engines.
    "q91_rank_family" -> QuerySpec(
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy(col("n_chars").desc)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"),
            percent_rank().over(w).as("pct_rnk"),
            cume_dist().over(w).as("cum_dist"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, lang, n_chars,
                rank() OVER w AS rnk,
                dense_rank() OVER w AS drnk,
                percent_rank() OVER w AS pct_rnk,
                cume_dist() OVER w AS cum_dist
         FROM documents
         WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC)
         ORDER BY doc_id"""),

    // Q92: incremental aggregate refresh — a stored per-key aggregate
    // (count/sum/min/max over the pre-cutoff events) merged with the
    // new batch's partials in ONE pass over the small aggregates, no
    // re-scan of history. The gate's oracle is the full recomputation:
    // algebraic state must merge to exactly what a cold rebuild gives.
    "q92_incremental_agg" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast("long").as("v_e2"))
        val cutoff = 1704844800000000L // 2024-01-10T00:00:00Z
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id").agg(
            count(lit(1)).as("n"), sum("v_e2").as("s"),
            min("v_e2").as("mn"), max("v_e2").as("mx"))
        val stored = agg(ev.filter(col("ts_us") < cutoff))
        val incoming = agg(ev.filter(col("ts_us") >= cutoff))
        stored.select(col("user_id"), col("n"), col("s"), col("mn"), col("mx"))
          .unionByName(incoming)
          .groupBy("user_id")
          .agg(sum("n").as("n_events"), sum("s").as("sum_e2"),
            min("mn").as("min_e2"), max("mx").as("max_e2"))
          .orderBy("user_id")
      },
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v_e2
                    FROM events)
         SELECT user_id, count(*) AS n_events,
                CAST(sum(v_e2) AS BIGINT) AS sum_e2,
                min(v_e2) AS min_e2, max(v_e2) AS max_e2
         FROM e GROUP BY 1 ORDER BY 1"""),

    // Q93: equi-depth binning — decile assignment of the quantized
    // value per event type via ntile over a UNIQUE ordering (ntile
    // distributes rows, so tie order must be pinned), profiled per
    // bin. The feature-bucketization step of model pipelines; one
    // type-keyed window + one tiny aggregate.
    "q93_equidepth_bins" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("v_e2"))
        val w = Window.partitionBy("event_type").orderBy("v_e2", "event_id")
        ev.withColumn("bin", ntile(10).over(w).cast("bigint"))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("n"),
            min("v_e2").as("lo_e2"), max("v_e2").as("hi_e2"))
          .orderBy("event_type", "bin")
      },
      """WITH e AS (SELECT event_type, event_id,
                           CAST(round(value * 100) AS BIGINT) AS v_e2
                    FROM events),
         b AS (SELECT event_type, v_e2,
                      ntile(10) OVER (PARTITION BY event_type
                                      ORDER BY v_e2, event_id) AS bin
               FROM e)
         SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n,
                min(v_e2) AS lo_e2, max(v_e2) AS hi_e2
         FROM b GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q94: typed-Aggregator top-k — the k smallest quantized values
    // per event type through a custom `Aggregator` whose state is k
    // longs per group on EVERY path (partial, shuffle, merge) — the
    // bounded-state alternative to sort-then-rank. The oracle is the
    // window formulation the aggregator must reproduce.
    "q94_topk_udaf" -> QuerySpec(
      (s, dir) => {
        val topk = udaf(new graft.functions.TopKSmallestAgg(5))
        Tables.events(s, dir)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("v_e2"))
          .groupBy("event_type")
          .agg(topk(col("v_e2")).as("tk"))
          .select(col("event_type"),
            array_join(transform(col("tk"), _.cast("string")), ",")
              .as("smallest5_e2"))
          .orderBy("event_type")
      },
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_e2
                    FROM events),
         r AS (SELECT event_type, v_e2,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY v_e2) AS rn
               FROM e)
         SELECT event_type,
                array_to_string(list_sort(list(v_e2)), ',') AS smallest5_e2
         FROM r WHERE rn <= 5 GROUP BY 1 ORDER BY 1"""),

    // Q95: the SQL surface — the same engine through `spark.sql` over
    // registered views, exercising the session-extension-injected
    // native function (`md5_prefix60`) from SQL text: a SQL-only user
    // gets the identical codegen'd expression the DataFrame API gets.
    "q95_sql_surface" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_documents")
        s.sql(
          """SELECT lang,
                    count(*) AS n_docs,
                    sum(pmod(md5_prefix60(text), 1000L)) AS hash_mix
             FROM g_documents
             GROUP BY lang ORDER BY lang""")
      },
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000)
                     AS BIGINT) AS hash_mix
         FROM documents GROUP BY 1 ORDER BY 1"""),

    // Q96: contribution analysis — each nation's share of total
    // revenue in integral ppm, the percent-of-total report: one
    // broadcast-joined aggregate + a 1-row total derived FROM the
    // persisted per-nation aggregate (no second fact scan).
    "q96_revenue_share" -> QuerySpec(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val per = graft.CacheScope.persist(
          o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
            .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
            .groupBy("n_name")
            .agg(sum(round(col("o_totalprice") * 100).cast("long"))
              .as("revenue_e2")))
        val total = per.agg(sum("revenue_e2").as("total_e2"))
        per.crossJoin(broadcast(total))
          .select(col("n_name"), col("revenue_e2"),
            expr("(revenue_e2 * 1000000L) div total_e2").as("share_e6"))
          .orderBy("n_name")
      },
      """WITH per AS (SELECT n_name,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS revenue_e2
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1)
         SELECT n_name, revenue_e2,
                (revenue_e2 * 1000000)
                  // (SELECT CAST(sum(revenue_e2) AS BIGINT) FROM per)
                  AS share_e6
         FROM per ORDER BY 1"""),

    // Q97: cumulative reach — distinct users ever seen through each
    // day, computed as new-user counts (first-activity day per user)
    // cumulatively summed over the day grid: no day-over-day distinct
    // re-count, one user shuffle + a dimension-sized window.
    "q97_cumulative_reach" -> QuerySpec(
      (s, dir) => {
        val firstDay = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(expr("min(unix_micros(ts) div 86400000000L)").as("first_day"))
        val newPerDay = firstDay.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("new_users"))
        newPerDay
          .withColumn("reach",
            sum("new_users").over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("day")
      },
      """WITH f AS (SELECT user_id,
                           min(epoch_us(ts) // 86400000000) AS first_day
                    FROM events GROUP BY 1),
         n AS (SELECT first_day AS day, count(*) AS new_users
               FROM f GROUP BY 1)
         SELECT day, new_users,
                CAST(sum(new_users) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS reach
         FROM n ORDER BY day"""),

    // Q98: ordered string aggregation — the listagg/string_agg report
    // shape (member names rolled into one delimited cell per group),
    // deterministic via explicit in-list ordering on both sides.
    "q98_string_agg" -> QuerySpec(
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_nations"),
            array_join(sort_array(collect_list(col("n_name"))), ",")
              .as("nations"))
          .orderBy("r_name")
      },
      """SELECT r_name, count(*) AS n_nations,
                string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1"""),

    // Q99: cohort conversion window — per signup-week cohort, how many
    // users purchased within 7 days of their first signup. The
    // existence probe is a per-user range semi-join (distinct AFTER
    // the range match); rates integral ppm.
    "q99_signup_conversion" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
        val signup = graft.CacheScope.persist(
          ev.filter(col("event_type") === "signup")
            .groupBy("user_id").agg(min("ts_us").as("t_signup")))
        val converted = ev.filter(col("event_type") === "purchase")
          .join(signup, "user_id")
          .filter(col("ts_us") > col("t_signup") &&
            col("ts_us") <= col("t_signup") + 604800000000L)
          .select("user_id").distinct()
          .withColumn("conv", lit(1L))
        signup.join(converted, Seq("user_id"), "left")
          .groupBy(expr("t_signup div 604800000000L").as("signup_week"))
          .agg(count(lit(1)).as("n_signups"),
            sum(coalesce(col("conv"), lit(0L))).as("n_converted_7d"))
          .withColumn("conv_e6",
            expr("(n_converted_7d * 1000000L) div n_signups"))
          .orderBy("signup_week")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
         s AS (SELECT user_id, min(ts_us) AS t_signup FROM e
               WHERE event_type = 'signup' GROUP BY 1),
         c AS (SELECT DISTINCT e.user_id FROM e JOIN s USING (user_id)
               WHERE event_type = 'purchase' AND ts_us > t_signup
                 AND ts_us <= t_signup + 604800000000),
         g AS (SELECT s.user_id, s.t_signup // 604800000000 AS signup_week,
                      CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
               FROM s LEFT JOIN c ON s.user_id = c.user_id)
         SELECT signup_week, count(*) AS n_signups,
                CAST(sum(conv) AS BIGINT) AS n_converted_7d,
                (CAST(sum(conv) AS BIGINT) * 1000000) // count(*) AS conv_e6
         FROM g GROUP BY 1 ORDER BY 1"""),

    // Q100: the pricing-summary classic (TPC-H Q1 semantics) with
    // fully integral money: every measure quantized before summation
    // (charge = price·(100−disc)·(100+tax) in e6 units), so the whole
    // report is one map-side-combined aggregate, order-free and
    // engine-exact — no decimal/float drift anywhere.
    "q100_pricing_summary" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val qtyE2 = round(col("l_quantity") * 100).cast("long")
        val priceE2 = round(col("l_extendedprice") * 100).cast("long")
        val discE2 = round(col("l_discount") * 100).cast("long")
        val taxE2 = round(col("l_tax") * 100).cast("long")
        li.filter(col("l_shipdate") <=
          to_timestamp_ntz(lit("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n_lines"),
            sum(qtyE2).as("sum_qty_e2"),
            sum(priceE2).as("sum_price_e2"),
            sum(priceE2 * (lit(100L) - discE2)).as("sum_disc_price_e4"),
            sum(priceE2 * (lit(100L) - discE2) * (lit(100L) + taxE2))
              .as("sum_charge_e6"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
                CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                  AS sum_qty_e2,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_price_e2,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS sum_disc_price_e4,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         * (100 + CAST(round(l_tax * 100) AS BIGINT)))
                     AS BIGINT) AS sum_charge_e6
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q76: inverted-index build — posting lists for terms in ≥50 docs,
    // heads truncated to the 10 smallest doc ids BEFORE the list
    // aggregate (bounded per-term state however hot the term). The
    // retrieval-side artifact of the TF-IDF/BM25 family.
    "q76_inverted_index" -> QuerySpec(
      (s, dir) =>
        Vocabulary.invertedIndex(Tables.documents(s, dir),
          col("doc_id"), col("text"), minDf = 50L, headN = 10)
          .orderBy("term"),
      """WITH td AS (SELECT DISTINCT * FROM
                (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents)),
         f AS (SELECT doc_id, term,
                 CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS doc_freq,
                 row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
               FROM td)
         SELECT term, doc_freq,
                array_to_string(list_sort(list(doc_id)), ',') AS postings_head
         FROM f WHERE doc_freq >= 50 AND rn <= 10
         GROUP BY 1, 2 ORDER BY term""")
  )
}
