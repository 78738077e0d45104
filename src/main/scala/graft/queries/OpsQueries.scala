package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.{AsOfJoin, AsOfJoinNative}
import graft.llm.{Curation, IncrementalDedup, SequencePacker, TextAnalysis, TextChunker, TextHash}

/** Round-5 extension operators, gated: as-of join, token chunking,
  * stratified sampling, bloom-routed incremental dedup, text
  * normalization, and the flagship broadcast-join aggregate. Every
  * oracle follows the determinism recipes in SCALING.md (epoch-µs
  * longs, the portable 60-bit md5 hash, integer-quantized money).
  */
object OpsQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q148: the NATIVE as-of join (custom logical node + planner
    // strategy + single-pass merge exec, `plans/AsOfJoin*.scala`) on
    // exactly q46's query and oracle: the two implementations compute
    // identical rows through entirely different physical plans — the
    // union+window's one combined shuffle + running window vs the
    // native per-side shuffles + O(1)-state forward merge.
    "q148_native_asof_join" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
        val clicks = ev.filter(col("event_type") === "click")
        AsOfJoinNative.asOf(purchases, clicks, "user_id", "ts_us", "event_id",
          payloadCols = Seq("event_id", "ts_us"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events),
         u AS (
           SELECT user_id, ts_us, event_id, 0 AS tag,
                  event_id AS r_id, ts_us AS r_ts
           FROM e WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts_us, event_id, 1 AS tag, NULL, NULL
           FROM e WHERE event_type = 'purchase'),
         m AS (
           SELECT user_id, ts_us, event_id, tag,
                  last_value(r_id IGNORE NULLS) OVER w AS asof_event_id,
                  last_value(r_ts IGNORE NULLS) OVER w AS asof_ts_us
           FROM u
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, ts_us, event_id, asof_event_id, asof_ts_us
         FROM m WHERE tag = 1 ORDER BY event_id"""),

    // Q149: tolerance-bounded as-of (pandas merge_asof parity) on the
    // native exec: a click older than 30 minutes before the purchase
    // is no attribution — matched rows outside the bound null-extend.
    // The oracle carries the matched right ts through the same running
    // window and applies the identical conditional.
    "q149_asof_tolerance" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
        val clicks = ev.filter(col("event_type") === "click")
        AsOfJoinNative.asOf(purchases, clicks, "user_id", "ts_us", "event_id",
          payloadCols = Seq("event_id", "ts_us"),
          toleranceUs = Some(1800000000L))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events),
         u AS (
           SELECT user_id, ts_us, event_id, 0 AS tag,
                  event_id AS r_id, ts_us AS r_ts
           FROM e WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts_us, event_id, 1 AS tag, NULL, NULL
           FROM e WHERE event_type = 'purchase'),
         m AS (
           SELECT user_id, ts_us, event_id, tag,
                  last_value(r_id IGNORE NULLS) OVER w AS a_id,
                  last_value(r_ts IGNORE NULLS) OVER w AS a_ts
           FROM u
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, ts_us, event_id,
                CASE WHEN ts_us - a_ts <= 1800000000 THEN a_id END AS asof_event_id,
                CASE WHEN ts_us - a_ts <= 1800000000 THEN a_ts END AS asof_ts_us
         FROM m WHERE tag = 1 ORDER BY event_id"""),

    // Q46: as-of join — for each purchase event, the most recent click
    // by the same user at-or-before the purchase. Union+window plan:
    // ONE shuffle on user_id, no range explosion (see AsOfJoin). The
    // oracle replicates the same formulation with IGNORE NULLS windows.
    "q46_asof_join" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
        val clicks = ev.filter(col("event_type") === "click")
        AsOfJoin.asOf(purchases, clicks, "user_id", "ts_us", "event_id",
          payloadCols = Seq("event_id", "ts_us"))
          .orderBy("event_id")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events),
         u AS (
           SELECT user_id, ts_us, event_id, 0 AS tag,
                  event_id AS r_id, ts_us AS r_ts
           FROM e WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts_us, event_id, 1 AS tag, NULL, NULL
           FROM e WHERE event_type = 'purchase'),
         m AS (
           SELECT user_id, ts_us, event_id, tag,
                  last_value(r_id IGNORE NULLS) OVER w AS asof_event_id,
                  last_value(r_ts IGNORE NULLS) OVER w AS asof_ts_us
           FROM u
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, ts_us, event_id, asof_event_id, asof_ts_us
         FROM m WHERE tag = 1 ORDER BY event_id"""),

    // Q47: fixed-size token chunking with overlap (64-token windows,
    // stride 56) — map-side + one generate, zero shuffles.
    "q47_token_chunks" -> QuerySpec(
      (s, dir) =>
        TextChunker.chunkTokens(
          Tables.documents(s, dir), col("doc_id"), col("text"),
          chunkSize = 64, stride = 56)
          .orderBy("doc_id", "chunk_idx"),
      """WITH b AS (
           SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n_toks
           FROM documents),
         c AS (
           SELECT doc_id, toks,
                  CASE WHEN n_toks <= 64 THEN 1
                       ELSE 1 + CAST(ceil((n_toks - 64) / 56.0) AS BIGINT)
                  END AS n_chunks
           FROM b),
         e AS (
           SELECT doc_id, toks,
                  unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
           FROM c),
         sl AS (
           SELECT doc_id, chunk_idx,
                  list_slice(toks, chunk_idx * 56 + 1, chunk_idx * 56 + 64) AS chunk
           FROM e)
         SELECT doc_id, chunk_idx,
                CAST(len(chunk) AS BIGINT) AS n_tokens,
                array_to_string(chunk, ' ') AS chunk_text
         FROM sl ORDER BY doc_id, chunk_idx"""),

    // Q48: stratified sampling — rebalance the corpus toward target
    // per-language rates in one map-side pass; the keep decision is a
    // pure function of (lang, content hash), reproducible anywhere.
    "q48_stratified_sample" -> QuerySpec(
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(Curation.stratifiedAccept(col("lang"), col("text"),
            Seq("en" -> 0.2, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.4)))
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id"),
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5('strat:' || text), 1, 15))::BIGINT % 10000 <
               CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 5000
                         WHEN 'es' THEN 5000 WHEN 'fr' THEN 5000
                         WHEN 'zh' THEN 4000 ELSE 0 END
         ORDER BY doc_id"""),

    // Q49: incremental dedup — incoming docs (doc_id % 3 = 0) minus any
    // whose content key already exists in the corpus (the other two
    // thirds). The bloom router passes definitely-new rows map-side;
    // only maybe-seen rows take the exact anti-join. Output is exact,
    // so the oracle is the plain anti-join.
    "q49_incremental_dedup" -> QuerySpec(
      (s, dir) => {
        val keyed = Tables.documents(s, dir).select(
          col("doc_id"), TextHash.hash60(col("text")).as("content_key"))
        val corpus = keyed.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .select("content_key")
        val incoming = keyed.filter(pmod(col("doc_id"), lit(3)) === 0)
        IncrementalDedup.newOnly(incoming, corpus, "content_key",
          expectedItems = 200000L, fpp = 0.01)
          .orderBy("doc_id")
      },
      """WITH k AS (SELECT doc_id,
                           ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_key
                    FROM documents)
         SELECT doc_id, content_key FROM k
         WHERE doc_id % 3 = 0
           AND content_key NOT IN
               (SELECT content_key FROM k WHERE doc_id % 3 <> 0)
         ORDER BY doc_id"""),

    // Q50: text normalization — the gate dirties each document
    // deterministically (case flip, control chars, ragged spacing,
    // stuttered punctuation) and checks the cleanup restores a
    // canonical form; the oracle applies the identical replacement
    // sequence with RE2-compatible patterns.
    "q50_normalize_text" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val dirty = concat(
          lit("  "), upper(col("text").substr(lit(1), lit(50))),
          lit("\t\t"), col("text").substr(lit(51), lit(1000000)),
          lit(" !!! "))
        docs.select(col("doc_id"), TextAnalysis.normalize(dirty).as("norm_text"))
          .orderBy("doc_id")
      },
      """WITH d AS (
           SELECT doc_id,
                  '  ' || upper(substr(text, 1, 50)) || chr(9) || chr(9) ||
                  substr(text, 51, 1000000) || ' !!! ' AS dirty
           FROM documents)
         SELECT doc_id,
                trim(regexp_replace(
                  regexp_replace(
                    regexp_replace(lower(dirty), '[\x00-\x1f]', ' ', 'g'),
                    '([.!?,]){2,}', '\1', 'g'),
                  '\s+', ' ', 'g')) AS norm_text
         FROM d ORDER BY doc_id"""),

    // Q51: the flagship 3-way broadcast-join aggregate (revenue per
    // nation), gated with integer-quantized money so the sum is exact
    // and order-free in both engines. Dimensions broadcast; the only
    // shuffle is the fact-side partial aggregate on n_name.
    "q51_revenue_broadcast" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val priceE2 = round(col("l_extendedprice") * 100).cast("long")
        val discE2 = round(col("l_discount") * 100).cast("long")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("line_count"),
            sum(priceE2 * (lit(100L) - discE2)).as("revenue_e4"))
          .orderBy("n_name")
      },
      """SELECT n_name, count(*) AS line_count,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                         (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_e4
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1"""),

    // Q53: sequence packing — every document's training-bin assignment
    // from the global running token total, computed as a two-level
    // distributed prefix sum (bucket totals + tiny offsets tier +
    // per-bucket windows) instead of the single-partition global
    // window. The oracle IS that global window — the gate proves the
    // distributed formulation reproduces it bit-for-bit.
    "q53_sequence_packing" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(
          col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
        SequencePacker.packBins(docs, col("doc_id"), col("n_tok"),
          budget = 1024L, bucketWidth = 64L)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      """WITH t AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                    FROM documents),
         c AS (SELECT doc_id, n_tok,
                 COALESCE(CAST(sum(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS before
               FROM t)
         SELECT doc_id, n_tok, before // 1024 AS bin
         FROM c ORDER BY doc_id"""),

    // Q54: range join with NO equi key — count the events (any user)
    // inside ±5-minute windows around each high-value purchase. The
    // naive Spark plan for a bare BETWEEN join is a nested loop; the
    // operator rewrites it as a bin equi-join (see RangeJoin). The
    // oracle states the containment join directly (DuckDB's IEJoin
    // handles it at oracle scale).
    "q54_range_join" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        val windows = ev
          .filter(col("event_type") === "purchase" && col("value") > 150)
          .select(col("event_id").as("window_id"),
            (col("ts_us") - 300000000L).as("lo_us"),
            (col("ts_us") + 300000000L).as("hi_us"))
        graft.analytics.RangeJoin.binnedIntervalJoin(
          ev.select("event_id", "ts_us"), "ts_us",
          windows, "lo_us", "hi_us", binWidth = 600000000L)
          .groupBy("window_id")
          .agg(count(lit(1)).as("n_events"),
            min("event_id").as("first_event_id"))
          .orderBy("window_id")
      },
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
                    FROM events),
         w AS (SELECT event_id AS window_id,
                      ts_us - 300000000 AS lo_us, ts_us + 300000000 AS hi_us
               FROM e WHERE event_type = 'purchase' AND value > 150)
         SELECT w.window_id, count(*) AS n_events,
                min(e.event_id) AS first_event_id
         FROM w JOIN e ON e.ts_us >= w.lo_us AND e.ts_us <= w.hi_us
         GROUP BY 1 ORDER BY 1"""),

    // Q55: group-wise top-k — the 3 longest documents per source
    // (deterministic tie-break on doc_id). One group-key shuffle;
    // WindowGroupLimit keeps per-partition state at k rows per group.
    "q55_topk_per_group" -> QuerySpec(
      (s, dir) =>
        Curation.topKPerGroup(
          Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
          col("source"),
          Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
          .withColumn("rank_in_group", col("rank_in_group").cast("bigint"))
          .orderBy("source", "rank_in_group"),
      """SELECT doc_id, source, n_chars, rank_in_group FROM (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rank_in_group
           FROM documents) t
         WHERE rank_in_group <= 3
         ORDER BY source, rank_in_group"""),

    // Q57: two-stage salted aggregation on a genuinely hot key space
    // (5 event types over the whole table) — the skew treatment for the
    // aggregation path AQE doesn't split. The salt only routes rows
    // (algebraic aggregates merge exactly), so the gate oracle is the
    // PLAIN group-by the salted plan must reproduce.
    "q57_salted_agg" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("event_type"), round(col("value") * 100).cast("long").as("v_e2"))
        graft.analytics.SkewedAgg.saltedAgg(
          ev, col("event_type"),
          partials = Seq(count(lit(1)).as("c"), sum("v_e2").as("sv")),
          merges = Seq(sum("c").as("cnt"), sum("sv").as("value_e2")))
          .select(col("key").as("event_type"), col("cnt"), col("value_e2"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*) AS cnt,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_e2
         FROM events GROUP BY 1 ORDER BY 1"""),

    // Q58: int8 scalar quantization of the embedding column (per-vector
    // max-abs scale) — the storage-reduction step before ANN indexing.
    // Map-only HOFs; the gate pins every element through order-free
    // integer aggregates of the quantized vector. floor(x/scale + 0.5)
    // instead of round() keeps the half-up rule identical across
    // engines.
    "q58_quantize_embeddings" -> QuerySpec(
      (s, dir) => {
        val x = transform(col("embedding"), e => e.cast("double"))
        val scale = (array_max(transform(x, e => abs(e))) / 127.0).as("scale")
        Tables.embeddings(s, dir)
          .select(col("vec_id"), x.as("x"), scale)
          .withColumn("qv",
            transform(col("x"), e => floor(e / col("scale") + lit(0.5)).cast("long")))
          .select(
            col("vec_id"),
            size(col("x")).cast("bigint").as("n_dims"),
            col("scale"),
            aggregate(col("qv"), lit(0L), (a, e) => a + e).as("q_sum"),
            aggregate(col("qv"), lit(0L), (a, e) => a + abs(e)).as("q_l1"),
            array_max(col("qv")).as("q_max"))
          .orderBy("vec_id")
      },
      """WITH b AS (
           SELECT vec_id,
                  list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x
           FROM embeddings),
         s AS (SELECT vec_id, x,
                 list_max(list_transform(x, e -> abs(e))) / 127.0 AS scale
               FROM b),
         q AS (SELECT vec_id, x, scale,
                 list_transform(x, e -> CAST(floor(e / scale + 0.5) AS BIGINT)) AS qv
               FROM s)
         SELECT vec_id,
                CAST(len(x) AS BIGINT) AS n_dims,
                scale,
                CAST(list_sum(qv) AS BIGINT) AS q_sum,
                CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_l1,
                list_max(qv) AS q_max
         FROM q ORDER BY vec_id"""),

    // Q59: temporal resampling with gap fill — hourly event counts per
    // type INCLUDING empty hours (dashboards and detectors need the
    // zeros). The dense (hour × type) grid is generated, not scanned
    // (hours-in-span × 5 types — dimension-sized however big the fact
    // table is), counts pre-aggregate before the join, and the grid
    // side broadcasts. Epoch-hour longs keep the axis engine-exact.
    "q59_resample_gapfill" -> QuerySpec(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          (unix_micros(col("ts")) / 3600000000L).cast("bigint").as("hour"),
          col("event_type"))
        val counts = ev.groupBy("hour", "event_type")
          .agg(count(lit(1)).as("cnt"))
        val span = ev.agg(min("hour").as("lo"), max("hour").as("hi"))
        val grid = span
          .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
          .crossJoin(ev.select("event_type").distinct())
        grid.join(counts, Seq("hour", "event_type"), "left")
          .select(col("hour"), col("event_type"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
          .orderBy("hour", "event_type")
      },
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type FROM events),
         c AS (SELECT hour, event_type, count(*) AS cnt FROM e GROUP BY 1, 2),
         h AS (SELECT unnest(generate_series(min(hour), max(hour))) AS hour FROM e),
         t AS (SELECT DISTINCT event_type FROM e),
         g AS (SELECT h.hour, t.event_type FROM h CROSS JOIN t)
         SELECT g.hour, g.event_type, COALESCE(c.cnt, 0) AS cnt
         FROM g LEFT JOIN c ON c.hour = g.hour AND c.event_type = g.event_type
         ORDER BY 1, 2"""),

    // Q60: exact per-group percentiles — p50/p95 of the integer-
    // quantized value per event type. Spark's percentile() and DuckDB's
    // quantile_cont() share the (n-1)*q interpolation formula over
    // exact integers, so the doubles agree bit-for-bit (the q38 recipe,
    // here per group instead of global).
    "q60_group_percentiles" -> QuerySpec(
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"), round(col("value") * 100).cast("long").as("v_e2"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("cnt"),
            expr("percentile(v_e2, 0.5)").as("p50_e2"),
            expr("percentile(v_e2, 0.95)").as("p95_e2"))
          .orderBy("event_type"),
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_e2
                    FROM events)
         SELECT event_type, count(*) AS cnt,
                quantile_cont(v_e2, 0.5) AS p50_e2,
                quantile_cont(v_e2, 0.95) AS p95_e2
         FROM e GROUP BY 1 ORDER BY 1"""),

    // Q61: the training-data preparation capstone — the round-5
    // operators composed end to end: normalize → content-hash exact
    // dedup (keep first) → token-length quality filter → stratified
    // rebalance → sequence packing. Each stage is the library operator,
    // not a re-implementation; the whole chain is map-side except the
    // dedup window (one hash shuffle) and the packer's bucket tier.
    "q61_prep_pipeline" -> QuerySpec(
      (s, dir) => {
        // STAGED (round-14 plan audit): the triple-regex normalize chain
        // once — inline it ran twice per row (hash key + token count).
        val keyed = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            TextAnalysis.normalize(col("text")).as("__nt"))
          .select(
            col("doc_id"), col("lang"),
            TextHash.hash60(col("__nt")).as("ck"),
            size(split(col("__nt"), " ")).cast("long").as("n_tok"))
        val deduped = graft.llm.Dedup.dropExactDuplicates(
          keyed, col("doc_id"), col("ck").cast("string"))
        val filtered = deduped.filter(col("n_tok").between(10, 200))
        val sampled = filtered.filter(Curation.stratifiedAccept(
          col("lang"), col("ck").cast("string"),
          Seq("en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0)))
        SequencePacker.packBins(
          sampled, col("doc_id"), col("n_tok"), budget = 1024L, bucketWidth = 64L)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      """WITH n AS (
           SELECT doc_id, lang,
                  trim(regexp_replace(
                    regexp_replace(
                      regexp_replace(lower(text), '[\x00-\x1f]', ' ', 'g'),
                      '([.!?,]){2,}', '\1', 'g'),
                    '\s+', ' ', 'g')) AS nt
           FROM documents),
         k AS (SELECT doc_id, lang,
                      ('0x' || substr(md5(nt), 1, 15))::BIGINT AS ck,
                      CAST(len(string_split(nt, ' ')) AS BIGINT) AS n_tok
               FROM n),
         d AS (SELECT * FROM k
               QUALIFY row_number() OVER (PARTITION BY ck ORDER BY doc_id) = 1),
         f AS (SELECT * FROM d WHERE n_tok BETWEEN 10 AND 200),
         sm AS (SELECT * FROM f
                WHERE ('0x' || substr(md5('strat:' || CAST(ck AS VARCHAR)), 1, 15))::BIGINT
                      % 10000 <
                      CASE lang WHEN 'en' THEN 5000 ELSE 10000 END),
         c AS (SELECT doc_id, n_tok,
                 COALESCE(CAST(sum(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS before
               FROM sm)
         SELECT doc_id, n_tok, before // 1024 AS bin
         FROM c ORDER BY doc_id"""),

    // Q62: snapshot reconciliation — the added/removed/changed/unchanged
    // diff between two corpus versions, the bookkeeping step of every
    // incremental refresh. ONE full-outer equi-join on the id (content
    // compared by hash, so the shuffle carries 16-byte keys + 8-byte
    // hashes, not document bodies); both snapshot derivations are
    // map-side over the same scan.
    "q62_snapshot_diff" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val old = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
          .select(col("doc_id"), TextHash.hash60(col("text")).as("old_hash"))
        val newer = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"), TextHash.hash60(
            when(pmod(col("doc_id"), lit(13)) === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text"))).as("new_hash"))
        old.join(newer, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("old_hash").isNull, lit("added"))
              .when(col("new_hash").isNull, lit("removed"))
              .when(col("old_hash") =!= col("new_hash"), lit("changed"))
              .otherwise(lit("unchanged")).as("status"))
          .orderBy("doc_id")
      },
      """WITH o AS (SELECT doc_id,
                           ('0x' || substr(md5(text), 1, 15))::BIGINT AS old_hash
                    FROM documents WHERE doc_id % 10 <> 9),
         n AS (SELECT doc_id,
                      ('0x' || substr(md5(CASE WHEN doc_id % 13 = 0
                                               THEN text || ' v2'
                                               ELSE text END), 1, 15))::BIGINT AS new_hash
               FROM documents WHERE doc_id % 10 <> 0)
         SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                CASE WHEN o.doc_id IS NULL THEN 'added'
                     WHEN n.doc_id IS NULL THEN 'removed'
                     WHEN o.old_hash <> n.new_hash THEN 'changed'
                     ELSE 'unchanged' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         ORDER BY doc_id"""),

    // Q63: per-key rolling aggregate — each user's running event count
    // and 5-event moving sum of the quantized value. Both windows
    // partition by user (per-key state only, one hash shuffle — the
    // same discipline as sessionization; an unpartitioned rolling
    // window would be the scale mistake). Integer sums keep the frame
    // math engine-exact.
    "q63_rolling_window" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir).select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          round(col("value") * 100).cast("long").as("v_e2"))
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        ev.select(
          col("user_id"), col("ts_us"), col("event_id"),
          row_number().over(w).cast("bigint").as("event_seq"),
          sum("v_e2").over(w.rowsBetween(-4, Window.currentRow))
            .as("mov5_v_e2"))
          .orderBy("user_id", "event_seq")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           CAST(round(value * 100) AS BIGINT) AS v_e2
                    FROM events)
         SELECT user_id, ts_us, event_id,
                row_number() OVER w AS event_seq,
                CAST(sum(v_e2) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS mov5_v_e2
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, event_seq"""),

    // Q64: bigram phrase mining — top-30 adjacent token pairs across
    // the corpus (the co-occurrence statistic behind phrase detection).
    // Pair generation is a map-side zip of the token array with its
    // tail; ONE token-pair shuffle with map-side combine; global top-k
    // as TakeOrderedAndProject, rank window on the 30 survivors.
    "q64_bigram_topk" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // STAGED (round-14 plan audit): the token array once — inline it
        // was re-split 4× per row (two slices + two sizes).
        val toks = col("__toks")
        val bigrams = zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))
        val counted = Tables.documents(s, dir)
          .select(split(col("text"), " ").as("__toks"))
          .select(explode(bigrams).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("bigram"))
          .limit(30)
        counted.withColumn("rank",
          row_number().over(Window.orderBy(desc("cnt"), asc("bigram")))
            .cast("bigint"))
          .orderBy("rank")
      },
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         p AS (SELECT unnest(list_transform(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1])) AS bigram
               FROM t),
         c AS (SELECT bigram, count(*) AS cnt FROM p GROUP BY 1),
         r AS (SELECT bigram, cnt,
                      row_number() OVER (ORDER BY cnt DESC, bigram) AS rank
               FROM c)
         SELECT bigram, cnt, rank FROM r WHERE rank <= 30 ORDER BY rank"""),

    // Q65: TF-IDF top terms per document, integer-exact: score_e6 =
    // (tf * 1e6 * n_docs) // (doc_len * doc_freq) — a rational tf-idf
    // (idf as the exact fraction n_docs/df rather than its log, so no
    // cross-engine libm dependency). One (doc,term) shuffle with
    // map-side combine, the vocabulary-sized doc-freq side broadcast,
    // and the per-doc top-3 rank bounded by WindowGroupLimit.
    "q65_tfidf_topterms" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        // corpus size rides the plan as a broadcast 1-row aggregate —
        // no separate driver-side count job per invocation
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val terms = docs
          .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("doc_len"),
            explode(split(col("text"), " ")).as("term"))
        // tf feeds BOTH the doc-freq aggregate and the join probe side;
        // unpersisted, the explode + two-phase aggregate executed twice
        // (plan audit r19: nodes 1–6 and 7–13 were the same subtree) —
        // persist computes the (doc,term) shuffle once
        val tf = graft.CacheScope.persist(
          terms.groupBy("doc_id", "doc_len", "term")
            .agg(count(lit(1)).as("tf")))
        val df = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
        val scored = tf.join(broadcast(df), "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("score_e6",
            expr("(tf * 1000000L * n_docs) div (doc_len * doc_freq)"))
        scored.withColumn("rank", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(desc("score_e6"), asc("term"))).cast("bigint"))
          .filter(col("rank") <= 3)
          .select("doc_id", "term", "score_e6", "rank")
          .orderBy("doc_id", "rank")
      },
      """WITH t AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS doc_len,
                           unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, doc_len, term, count(*) AS tf
                FROM t GROUP BY 1, 2, 3),
         df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
         sc AS (SELECT tf.doc_id, tf.term,
                       (tf.tf * 1000000 * (SELECT count(*) FROM documents))
                         // (tf.doc_len * df.doc_freq) AS score_e6
                FROM tf JOIN df USING (term)),
         r AS (SELECT doc_id, term, CAST(score_e6 AS BIGINT) AS score_e6,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score_e6 DESC, term) AS rank
               FROM sc)
         SELECT doc_id, term, score_e6, rank FROM r
         WHERE rank <= 3 ORDER BY doc_id, rank"""),

    // Q66: data-quality validation report — the expectations pass an
    // ETL engine runs before loading: null counts, range violations,
    // referential orphans, duplicate keys. ONE scan per fact table
    // (every check is a conditional aggregate), one broadcast-able
    // anti-join for the orphan check; all counts exact integers.
    "q66_data_quality" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        // every piece is a lazy 1-row aggregate; the report row is
        // their broadcast cross product — one job, no driver actions
        val orphans = li.join(o.select("o_orderkey"),
          li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("orphan_lineitems"))
        val dupKeys = o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .agg(count(lit(1)).as("dup_orderkeys"))
        li.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_quantity"),
          sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
            .otherwise(0L)).as("bad_discount"),
          sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"))
          .crossJoin(broadcast(orphans))
          .crossJoin(broadcast(dupKeys))
      },
      """SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS null_quantity,
                CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bad_discount,
                CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS bad_price,
                CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS null_shipdate,
                (SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                  AS orphan_lineitems,
                (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                       GROUP BY 1 HAVING count(*) > 1))
                  AS dup_orderkeys
         FROM lineitem"""),

    // Q67: event-type transition statistics (session-flow analysis) —
    // for each user the lag window pairs consecutive events, then one
    // small shuffle counts (from, to) transitions; probabilities are
    // integer-exact per-million rates via integral division.
    "q67_transitions" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val pairs = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type"))
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
        val counts = pairs.groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
          .agg(count(lit(1)).as("cnt"))
        val totals = counts.groupBy("from_type")
          .agg(sum("cnt").as("total"))
        counts.join(broadcast(totals), "from_type")
          .withColumn("p_e6", expr("(cnt * 1000000L) div total"))
          .select("from_type", "to_type", "cnt", "p_e6")
          .orderBy("from_type", "to_type")
      },
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events),
         p AS (SELECT event_type AS from_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts_us, event_id) AS to_type
               FROM e),
         c AS (SELECT from_type, to_type, count(*) AS cnt
               FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS total
               FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.cnt,
                (c.cnt * 1000000) // t.total AS p_e6
         FROM c JOIN t USING (from_type)
         ORDER BY 1, 2"""),

    // Q233: k-anonymity audit — the release-side privacy check next to
    // the q207 erasure cascade: for the quasi-identifier combination
    // (event_type, day, value-bucket), how many equivalence classes
    // fall below k = 5, and how many rows they re-identify. One
    // map-side-combined rollup on the quasi-identifier triple, then a
    // per-type summary over the (tiny) class relation — the corpus is
    // scanned once, and min_k is the headline number a release gate
    // thresholds on. Buckets are integral (floor to whole units, 50
    // per bucket): the equivalence classing must be reproducible
    // across engines or the audit itself is noise.
    "q233_k_anonymity" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q233_events")
        s.sql("""
          WITH q AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(floor(value) AS BIGINT) div 50 AS vb
                     FROM g_q233_events),
          g AS (SELECT event_type, day, vb, CAST(count(*) AS BIGINT) AS k
                FROM q GROUP BY 1, 2, 3)
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(min(k) AS BIGINT) AS min_k,
                 CAST(count(CASE WHEN k < 5 THEN 1 END) AS BIGINT)
                   AS classes_lt5,
                 CAST(coalesce(sum(CASE WHEN k < 5 THEN k END), 0) AS BIGINT)
                   AS rows_lt5
          FROM g GROUP BY 1 ORDER BY 1""")
      },
      """WITH q AS (SELECT event_type, CAST(ts AS DATE) AS day,
                           CAST(floor(value) AS BIGINT) // 50 AS vb
                    FROM events),
         g AS (SELECT event_type, day, vb, CAST(count(*) AS BIGINT) AS k
               FROM q GROUP BY 1, 2, 3)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_classes,
                CAST(min(k) AS BIGINT) AS min_k,
                CAST(count(CASE WHEN k < 5 THEN 1 END) AS BIGINT)
                  AS classes_lt5,
                CAST(coalesce(sum(CASE WHEN k < 5 THEN k END), 0) AS BIGINT)
                  AS rows_lt5
         FROM g GROUP BY 1 ORDER BY 1""")
  )
}
