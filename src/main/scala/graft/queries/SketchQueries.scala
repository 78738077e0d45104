package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.TableChecksum

/** Round-9 sketch/integrity surface: order-independent fingerprints and
  * mergeable summary aggregates — the "compare 100 TB by exchanging a
  * few numbers" toolbox.
  */
object SketchQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q174: order-independent table fingerprint, grouped by return
    // flag — count + bit_xor + digest-sum of a 60-bit row digest over
    // a canonical integer/date rendering. Row order, file layout, and
    // partitioning can't change it; any changed row does. The grouped
    // form localizes a replication mismatch to the shard to re-copy.
    // One map-side-combined aggregate; the shuffle carries a triple
    // per (group × partition). The emitted fp_sum is the exact
    // decimal sum folded mod 2^62 so the gate's final columns are all
    // BIGINT (OracleIdioms rule 1 — the round-9 driver mismatch was
    // exactly the DECIMAL(38,0)-final gates); the unfolded decimal
    // stays available from TableChecksum.fingerprint directly.
    "q174_table_checksum" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        TableChecksum.fingerprint(
          li,
          cols = Seq(
            col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"),
            round(col("l_quantity")).cast("long").cast("string"),
            round(col("l_extendedprice") * 100).cast("long").cast("string"),
            round(col("l_discount") * 100).cast("long").cast("string"),
            col("l_returnflag"), col("l_linestatus"),
            to_date(col("l_shipdate")).cast("string")),
          groupKeys = Seq(col("l_returnflag")))
          .withColumn("fp_sum",
            (col("fp_sum") % OracleIdioms.fold62.toLong).cast("long"))
          .orderBy("l_returnflag")
      },
      s"""WITH c AS (SELECT l_returnflag,
                      concat_ws('|',
                        CAST(l_orderkey AS VARCHAR),
                        CAST(l_linenumber AS VARCHAR),
                        CAST(CAST(round(l_quantity) AS BIGINT) AS VARCHAR),
                        CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR),
                        CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR),
                        l_returnflag, l_linestatus,
                        CAST(CAST(l_shipdate AS DATE) AS VARCHAR)) AS s
                    FROM lineitem),
         h AS (SELECT l_returnflag,
                      ${OracleIdioms.hex60("s")} AS d
               FROM c)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(bit_xor(d) AS BIGINT) AS fp_xor,
                CAST(sum(CAST(d AS HUGEINT)) % ${OracleIdioms.fold62}
                     AS BIGINT) AS fp_sum
         FROM h GROUP BY 1 ORDER BY 1"""),

    // Q177: bitmap sketch ALGEBRA — audience-overlap matrix between
    // event types from pre-aggregated per-type user bitmaps. One scan
    // builds five 4096-bit sketches; every pairwise intersection/union
    // is then a scalar popcount over kilobytes (the tiny sketch
    // relation self-joins broadcast). At 100 TB this answers the whole
    // question matrix without ever re-shuffling raw rows — the
    // property exact distinct-join overlap can never have. Counts are
    // exact over occupied buckets (hash mod m), which is what the
    // oracle recomputes set-theoretically.
    "q177_bitmap_setops" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q177_events")
        s.sql("""
          WITH sk AS (
            SELECT event_type,
                   graft_bitmap_agg(
                     md5_prefix60(CAST(user_id AS STRING)), 4096) AS bm
            FROM g_q177_events GROUP BY event_type)
          SELECT a.event_type AS et_a, b.event_type AS et_b,
                 graft_bitmap_popcount(a.bm) AS n_a,
                 graft_bitmap_popcount(b.bm) AS n_b,
                 graft_bitmap_and_count(a.bm, b.bm) AS n_and,
                 graft_bitmap_or_count(a.bm, b.bm) AS n_or
          FROM sk a JOIN sk b ON a.event_type < b.event_type
          ORDER BY et_a, et_b""")
      },
      """WITH b AS (SELECT DISTINCT event_type AS et,
                      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                        % 4096 AS bucket
                    FROM events),
         sz AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
         inter AS (SELECT x.et AS et_a, y.et AS et_b,
                          CAST(count(*) AS BIGINT) AS n_and
                   FROM b x JOIN b y ON x.bucket = y.bucket AND x.et < y.et
                   GROUP BY 1, 2)
         SELECT sa.et AS et_a, sb.et AS et_b, sa.n AS n_a, sb.n AS n_b,
                COALESCE(i.n_and, 0) AS n_and,
                sa.n + sb.n - COALESCE(i.n_and, 0) AS n_or
         FROM sz sa JOIN sz sb ON sa.et < sb.et
         LEFT JOIN inter i ON i.et_a = sa.et AND i.et_b = sb.et
         ORDER BY et_a, et_b"""),

    // Q178: SpaceSaving heavy hitters — per-source top-5 tokens from a
    // bounded-memory mergeable summary (≤ 64 counters per state, any
    // corpus size). The gate runs in the exact regime (vocabulary <
    // capacity ⇒ no eviction, err = 0, counts exact — what the oracle
    // recomputes as a plain grouped count); the approximate regime's
    // ε ≤ N/capacity bound is pinned by FrequentItemsSpec. At 100 TB
    // the summary IS the point: per-partition partials of fixed size
    // shuffle instead of the full token distribution, and per-shard
    // summaries merge into corpus rollups without re-reading text.
    "q178_frequent_tokens" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q178_documents")
        s.sql("""
          WITH f AS (SELECT source, graft_frequent(tok, 64) AS fi
                     FROM (SELECT source, explode(split(text, ' ')) AS tok
                           FROM g_q178_documents)
                     GROUP BY source)
          SELECT source, CAST(pos + 1 AS BIGINT) AS rank,
                 e.item AS token, e.cnt, e.err
          FROM f LATERAL VIEW posexplode(fi) AS pos, e
          WHERE pos < 5 ORDER BY source, rank""")
      },
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token
                    FROM documents),
         c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
               FROM t GROUP BY 1, 2),
         r AS (SELECT source, token, cnt,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, token) AS rank
               FROM c)
         SELECT source, CAST(rank AS BIGINT) AS rank, token, cnt,
                CAST(0 AS BIGINT) AS err
         FROM r WHERE rank <= 5 ORDER BY source, rank"""),

    // Q186: HyperLogLog distinct users per event type — the
    // constant-size mergeable distinct sketch next to the exact bitmap
    // family (q164/q177): 1 KiB per group at m=1024 regardless of
    // corpus size, registers merge by max under any partitioning.
    // DETERMINISM: the emitted raw estimate is an exact integer
    // division (see HyperLogLogAgg's rational rewrite of
    // alpha_m*m^2/S) — the oracle rebuilds the registers from the same
    // md5 hash split (index = h mod m, rho from the arithmetic bit
    // length of h div m — a powers-of-two VALUES table, not
    // length(bin()), per OracleIdioms rule 3) and reproduces
    // v / s_scaled / est bit-for-bit. s_scaled (< 2^71) is emitted
    // folded mod 2^62 so the final column is BIGINT, not DECIMAL —
    // the register sum's full magnitude already reaches the gate
    // through est. exact_n rides along to exhibit the estimate
    // against truth, and `regime` makes the estimator's published
    // decision rule explicit: raw HLL overestimates below ~2.5m
    // (visible here: 150 distinct users -> est 887 at m=1024), where
    // the standard correction is linear counting m*ln(m/v) over the
    // SAME emitted v — the transcendental step is left out of the
    // gate to stay bit-exact.
    "q186_hll_users" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q186_events")
        s.sql(s"""
          WITH h AS (SELECT event_type,
                            graft_hll(md5_prefix60(CAST(user_id AS STRING)),
                                      1024) AS hll,
                            count(DISTINCT user_id) AS exact_n
                     FROM g_q186_events GROUP BY event_type)
          SELECT event_type, hll.v AS v,
                 CAST(hll.s_scaled % ${OracleIdioms.fold62} AS BIGINT)
                   AS s_scaled,
                 hll.est AS est, CAST(exact_n AS BIGINT) AS exact_n,
                 CASE WHEN hll.v > 0 AND hll.est <= 2560
                      THEN 'small_range_lc' ELSE 'raw_hll' END AS regime
          FROM h ORDER BY event_type""")
      },
      s"""WITH pw(p) AS (VALUES ${OracleIdioms.pow2Values50}),
         p2(e, pv) AS (VALUES ${OracleIdioms.pow2Pairs60}),
         h AS (SELECT event_type,
                      ${OracleIdioms.hex60("CAST(user_id AS VARCHAR)")}
                        AS hv
               FROM events),
         b AS (SELECT DISTINCT event_type, hv % 1024 AS reg, hv // 1024 AS w
               FROM h),
         bl AS (SELECT event_type, reg, w,
                       sum(CASE WHEN w >= p THEN 1 ELSE 0 END) AS bitlen
                FROM b CROSS JOIN pw GROUP BY 1, 2, 3),
         r AS (SELECT event_type, reg,
                      max(CASE WHEN w = 0 THEN 51
                               ELSE 51 - bitlen END) AS mj
               FROM bl GROUP BY 1, 2),
         a AS (SELECT event_type,
                      CAST(1024 - count(*) AS BIGINT) AS v,
                      sum(CAST(p2.pv AS HUGEINT))
                        + CAST(1024 - count(*) AS HUGEINT)
                          * 1152921504606846976 AS s
               FROM r JOIN p2 ON p2.e = 60 - r.mj
               GROUP BY 1),
         x AS (SELECT event_type, v, s,
                      (CAST(7213 AS HUGEINT) * 1073741824
                       * 1152921504606846976)
                        // (CAST(10250790 AS HUGEINT) * s) AS est
               FROM a),
         e AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
                        AS exact_n
               FROM events GROUP BY 1)
         SELECT x.event_type AS event_type, x.v,
                CAST(x.s % ${OracleIdioms.fold62} AS BIGINT) AS s_scaled,
                CAST(x.est AS BIGINT) AS est, e.exact_n,
                CASE WHEN x.v > 0 AND x.est <= 2560
                     THEN 'small_range_lc' ELSE 'raw_hll' END AS regime
         FROM x JOIN e ON x.event_type = e.event_type
         ORDER BY x.event_type"""),

    // Q187: Count-Min sketch over the document token stream — build
    // one 4x512 counter grid in a single aggregate (hash family made
    // explicit as a transform() over depths so the oracle recomputes
    // identical cells), then answer point queries for the top-10 true
    // tokens from the sketch alone. est_cnt >= true_cnt always (CMS
    // never undercounts); the gap IS the collision error the
    // depth/width tradeoff controls. The query side joins a 1-row
    // sketch relation broadcast against the query items — at 100 TB
    // the corpus is scanned once and every later frequency question
    // costs kilobytes.
    "q187_cms_tokens" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q187_documents")
        s.sql("""
          WITH tok AS (SELECT explode(split(text, ' ')) AS t
                       FROM g_q187_documents),
          b AS (SELECT t, transform(sequence(0, 3),
                           d -> md5_prefix60(concat(CAST(d AS STRING), '|', t))
                                  % 512) AS bk
                FROM tok),
          sk AS (SELECT graft_cms_agg(bk, 4, 512) AS s FROM b),
          truth AS (SELECT t, CAST(count(*) AS BIGINT) AS true_cnt
                    FROM tok GROUP BY 1),
          top AS (SELECT t, true_cnt FROM truth
                  ORDER BY true_cnt DESC, t LIMIT 10)
          SELECT top.t AS token, top.true_cnt,
                 graft_cms_query(sk.s,
                   transform(sequence(0, 3),
                     d -> md5_prefix60(concat(CAST(d AS STRING), '|', top.t))
                            % 512)) AS est_cnt
          FROM top CROSS JOIN sk
          ORDER BY true_cnt DESC, token""")
      },
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
                      FROM documents),
         truth AS (SELECT t, CAST(count(*) AS BIGINT) AS true_cnt
                   FROM tok GROUP BY 1),
         d AS (SELECT unnest([0, 1, 2, 3]) AS d),
         tb AS (SELECT d.d, t.t, t.true_cnt,
                       ('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || t.t), 1, 15))::BIGINT
                         % 512 AS bucket
                FROM truth t CROSS JOIN d),
         cell AS (SELECT d, bucket, CAST(sum(true_cnt) AS BIGINT) AS c
                  FROM tb GROUP BY 1, 2),
         top AS (SELECT t, true_cnt FROM truth
                 ORDER BY true_cnt DESC, t LIMIT 10),
         est AS (SELECT top.t, top.true_cnt, min(cell.c) AS est_cnt
                 FROM top
                 JOIN tb ON tb.t = top.t
                 JOIN cell ON cell.d = tb.d AND cell.bucket = tb.bucket
                 GROUP BY 1, 2)
         SELECT t AS token, true_cnt, CAST(est_cnt AS BIGINT) AS est_cnt
         FROM est ORDER BY true_cnt DESC, token"""),

    // Q226: KMV set-operation estimation — the payoff of the k-minimum-
    // values family (q191): two per-set sketches answer UNION size,
    // INTERSECTION size, and Jaccard without touching rows again.
    // k-min(A∪B) = k-min(k-min(A) ∪ k-min(B)) (any of the union's k
    // smallest is among its own set's k smallest), so the union sketch
    // is distinct-merge + take-k of the two 64-long arrays; and any
    // union-sketch member that belongs to A is guaranteed to be IN A's
    // sketch, which makes the membership test against the sketches —
    // not the sets — exact. match/k estimates Jaccard; match/k × the
    // union estimate prices the intersection. Everything after the two
    // sketch aggregates runs on kilobytes; exact countDistinct columns
    // ride along so the gate exposes the estimation error. Estimate
    // division via DECIMAL(38,0)/HUGEINT intermediates (63·2⁶⁰ passes
    // int64); finals all BIGINT per OracleIdioms rule 1.
    "q226_kmv_set_ops" -> QuerySpec(
      (s, dir) => {
        val kmv = udaf(new graft.functions.KmvSketchAgg(64))
        val docs = Tables.documents(s, dir)
        // a and b each feed THREE consumers (own sketch, exact union,
        // exact intersection) — unpersisted that is six documents scans
        // with the md5 hash recomputed per consumer (§2.4 shared-subtree
        // rule). Persist the two narrow (hv, doc_id) projections once.
        val a = graft.CacheScope.persist(docs.filter(col("n_chars") % 2 === 0)
          .select(expr("md5_prefix60(CAST(doc_id AS STRING))").as("hv"),
            col("doc_id")))
        val b = graft.CacheScope.persist(docs.filter(col("doc_id") % 3 > 0)
          .select(expr("md5_prefix60(CAST(doc_id AS STRING))").as("hv"),
            col("doc_id")))
        val ska = a.agg(kmv(col("hv")).as("ska"))
        val skb = b.agg(kmv(col("hv")).as("skb"))
        val exU = a.select("doc_id").union(b.select("doc_id"))
          .agg(countDistinct("doc_id").as("exact_union"))
        val exI = a.select("doc_id").intersect(b.select("doc_id"))
          .agg(count(lit(1)).as("exact_inter"))
        ska.join(skb).join(exU).join(exI)
          .withColumn("u",
            expr("slice(array_sort(array_distinct(concat(ska, skb))), 1, 64)"))
          .withColumn("n_kept", size(col("u")).cast("long"))
          .withColumn("union_est",
            when(col("n_kept") < 64, col("n_kept"))
              .otherwise(expr(
                "(CAST(63 AS DECIMAL(38,0)) * 1152921504606846976) div try_element_at(u, 64)")))
          .withColumn("match_cnt",
            expr("CAST(size(array_intersect(array_intersect(u, ska), skb)) AS BIGINT)"))
          .select(
            col("n_kept"),
            expr("try_element_at(u, 64)").as("h_k"),
            col("union_est").cast("long").as("union_est"),
            col("match_cnt"),
            expr("(match_cnt * 1000000) div n_kept").as("jaccard_ppm"),
            expr("(match_cnt * union_est) div n_kept").as("inter_est"),
            col("exact_union").cast("long").as("exact_union"),
            col("exact_inter").cast("long").as("exact_inter"),
            expr("(exact_inter * 1000000) div exact_union").as("exact_j_ppm"))
      },
      s"""WITH a AS (SELECT DISTINCT doc_id FROM documents
                     WHERE n_chars % 2 = 0),
         b AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 3 > 0),
         ha AS (SELECT doc_id,
                       ${OracleIdioms.hex60("CAST(doc_id AS VARCHAR)")} AS hv
                FROM a),
         hb AS (SELECT doc_id,
                       ${OracleIdioms.hex60("CAST(doc_id AS VARCHAR)")} AS hv
                FROM b),
         ka AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv)
                                          AS rn FROM ha) WHERE rn <= 64),
         kb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv)
                                          AS rn FROM hb) WHERE rn <= 64),
         uu AS (SELECT DISTINCT hv FROM
                  (SELECT hv FROM ka UNION ALL SELECT hv FROM kb)),
         u AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM uu),
         uk AS (SELECT hv, rn FROM u WHERE rn <= 64),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
                       max(CASE WHEN rn = 64 THEN hv END) AS h_k,
                       CAST(count(*) FILTER (WHERE hv IN (SELECT hv FROM ka)
                                               AND hv IN (SELECT hv FROM kb))
                            AS BIGINT) AS match_cnt
                FROM uk),
         est AS (SELECT n_kept, h_k, match_cnt,
                        CASE WHEN n_kept < 64 THEN n_kept
                             ELSE CAST((CAST(63 AS HUGEINT)
                                        * (CAST(1 AS BIGINT) << 60)) // h_k
                                       AS BIGINT) END AS union_est
                 FROM st),
         ex AS (SELECT CAST((SELECT count(*) FROM
                              (SELECT doc_id FROM a
                               UNION SELECT doc_id FROM b)) AS BIGINT)
                         AS exact_union,
                       CAST((SELECT count(*) FROM a
                             WHERE doc_id IN (SELECT doc_id FROM b))
                            AS BIGINT) AS exact_inter)
         SELECT e.n_kept, e.h_k, e.union_est, e.match_cnt,
                (e.match_cnt * 1000000) // e.n_kept AS jaccard_ppm,
                (e.match_cnt * e.union_est) // e.n_kept AS inter_est,
                ex.exact_union, ex.exact_inter,
                (ex.exact_inter * 1000000) // ex.exact_union AS exact_j_ppm
         FROM est e CROSS JOIN ex"""),

    // Q237: sliding-window distinct from MERGED daily sketches — the
    // re-aggregation payoff of graft_bitmap_or_agg: per-day user
    // bitmaps are built ONCE (one corpus scan), and every 7-day
    // window's reach is then an OR-merge aggregate over ≤ 7 kilobyte
    // binaries + one popcount. The exact sliding distinct (recomputed
    // per window from raw (day, user) rows — what q196 does) rides
    // along so the gate exposes the bucket-collision error. At 100 TB
    // the daily sketch table is the ONLY thing that ever reads events;
    // reach questions for any window, month, or cohort union are
    // answered from it at kilobyte cost. The day×day range join is
    // broadcast-trivial (the day relation is calendar-sized).
    "q237_window_reach_sketch" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q237_events")
        s.sql("""
          WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id
                     FROM g_q237_events),
          daily AS (SELECT day,
                           graft_bitmap_agg(
                             md5_prefix60(CAST(user_id AS STRING)),
                             4096) AS bm
                    FROM e GROUP BY day),
          w AS (SELECT day AS end_day FROM daily),
          merged AS (SELECT w.end_day, CAST(count(*) AS BIGINT) AS n_days,
                            graft_bitmap_popcount(graft_bitmap_or_agg(d.bm))
                              AS sketch_distinct
                     FROM w JOIN daily d
                       ON d.day BETWEEN date_sub(w.end_day, 6) AND w.end_day
                     GROUP BY w.end_day),
          du AS (SELECT DISTINCT day, user_id FROM e),
          ex AS (SELECT w.end_day,
                        CAST(count(DISTINCT du.user_id) AS BIGINT)
                          AS exact_distinct
                 FROM w JOIN du
                   ON du.day BETWEEN date_sub(w.end_day, 6) AND w.end_day
                 GROUP BY w.end_day)
          SELECT m.end_day, m.n_days,
                 CAST(m.sketch_distinct AS BIGINT) AS sketch_distinct,
                 ex.exact_distinct
          FROM merged m JOIN ex ON m.end_day = ex.end_day
          ORDER BY end_day""")
      },
      s"""WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         b AS (SELECT DISTINCT day,
                      ${OracleIdioms.hex60("CAST(user_id AS VARCHAR)")}
                        % 4096 AS bucket
               FROM e),
         w AS (SELECT DISTINCT day AS end_day FROM e),
         sk AS (SELECT w.end_day,
                       CAST(count(DISTINCT b.day) AS BIGINT) AS n_days,
                       CAST(count(DISTINCT b.bucket) AS BIGINT)
                         AS sketch_distinct
                FROM w JOIN b ON b.day BETWEEN w.end_day - 6 AND w.end_day
                GROUP BY 1),
         du AS (SELECT DISTINCT day, user_id FROM e),
         ex AS (SELECT w.end_day,
                       CAST(count(DISTINCT du.user_id) AS BIGINT)
                         AS exact_distinct
                FROM w JOIN du
                  ON du.day BETWEEN w.end_day - 6 AND w.end_day
                GROUP BY 1)
         SELECT sk.end_day, sk.n_days, sk.sketch_distinct, ex.exact_distinct
         FROM sk JOIN ex ON sk.end_day = ex.end_day
         ORDER BY sk.end_day""")
  )
}
