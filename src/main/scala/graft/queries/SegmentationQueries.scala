package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 session-3 segmentation surface: consistent-hashing shard
  * assignment with measured resharding movement (q257), sessionized
  * event-sequence mining (q258), and RFM customer segmentation (q259).
  */
object SegmentationQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q257: consistent hashing — the shard map that makes scaling a
    // 100 TB store cheap: each shard owns 8 virtual nodes on a 2⁶⁰
    // md5 ring, a document goes to the vnode at the smallest
    // clockwise distance, and growing 4→5 shards moves only the keys
    // the new shard's vnodes capture (≈1/5), not the ≈4/5 a modulo
    // rehash moves. The gate emits both shard maps AND both measured
    // movement counts — the consistent-vs-modulo contrast is the
    // operator's reason to exist. Plan shape: the ring is a broadcast
    // literal-sized relation; assignment is a per-doc
    // WindowGroupLimit top-1 over ≤48 candidates.
    "q257_consistent_hashing" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("dpos",
            graft.llm.TextHash.hash60(
              concat(lit("doc|"), col("doc_id").cast("string"))))
          .transform(graft.CacheScope.persist)
        def ring(n: Int) = s.range(n.toLong).select(col("id").as("shard"))
          .crossJoin(s.range(8).select(col("id").as("vnode")))
          .withColumn("rpos", graft.llm.TextHash.hash60(
            concat(lit("ring|"), col("shard").cast("string"),
              lit("|"), col("vnode").cast("string"))))
        def assign(n: Int, out: String) = docs
          .crossJoin(broadcast(ring(n)))
          .withColumn("dist",
            pmod(col("rpos") - col("dpos"), lit(1L << 60)))
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy("dist", "shard")))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("shard").as(out))
        val a4 = assign(4, "s4").transform(graft.CacheScope.persist)
        val a5 = assign(5, "s5").transform(graft.CacheScope.persist)
        val both = a4.join(a5, "doc_id")
          .withColumn("m4", pmod(col("doc_id"), lit(4L)))
          .withColumn("m5", pmod(col("doc_id"), lit(5L)))
          .transform(graft.CacheScope.persist)
        val maps = both.groupBy(col("s4")).agg(count(lit(1)).as("n"))
          .select(lit("ring_n4").as("config"), col("s4").cast("long").as("shard"),
            col("n").cast("long").as("n_docs"))
          .unionByName(both.groupBy(col("s5")).agg(count(lit(1)).as("n"))
            .select(lit("ring_n5").as("config"),
              col("s5").cast("long").as("shard"),
              col("n").cast("long").as("n_docs")))
        val moved = both.agg(
          sum(when(col("s4") =!= col("s5"), 1L).otherwise(0L)).as("ring"),
          sum(when(col("m4") =!= col("m5"), 1L).otherwise(0L)).as("modulo"))
          .selectExpr(
            """stack(2,
                 'moved_ring', CAST(-1 AS BIGINT), CAST(ring AS BIGINT),
                 'moved_modulo', CAST(-1 AS BIGINT), CAST(modulo AS BIGINT))
               AS (config, shard, n_docs)""")
        maps.unionByName(moved).orderBy("config", "shard")
      },
      s"""WITH docs AS (SELECT doc_id,
                   ${OracleIdioms.hex60("'doc|' || CAST(doc_id AS VARCHAR)")}
                     AS dpos
                 FROM documents),
         ring4 AS (SELECT s.s AS shard, v.v AS vnode,
                     ${OracleIdioms.hex60(
                       "'ring|' || CAST(s.s AS VARCHAR) || '|' || CAST(v.v AS VARCHAR)")}
                       AS rpos
                   FROM generate_series(0, 3) s(s),
                        generate_series(0, 7) v(v)),
         ring5 AS (SELECT s.s AS shard, v.v AS vnode,
                     ${OracleIdioms.hex60(
                       "'ring|' || CAST(s.s AS VARCHAR) || '|' || CAST(v.v AS VARCHAR)")}
                       AS rpos
                   FROM generate_series(0, 4) s(s),
                        generate_series(0, 7) v(v)),
         a4 AS (SELECT doc_id, shard AS s4 FROM
                (SELECT d.doc_id, r.shard,
                        row_number() OVER (PARTITION BY d.doc_id
                          ORDER BY ((r.rpos - d.dpos) % 1152921504606846976
                                    + 1152921504606846976)
                                   % 1152921504606846976, r.shard) AS rk
                 FROM docs d CROSS JOIN ring4 r) WHERE rk = 1),
         a5 AS (SELECT doc_id, shard AS s5 FROM
                (SELECT d.doc_id, r.shard,
                        row_number() OVER (PARTITION BY d.doc_id
                          ORDER BY ((r.rpos - d.dpos) % 1152921504606846976
                                    + 1152921504606846976)
                                   % 1152921504606846976, r.shard) AS rk
                 FROM docs d CROSS JOIN ring5 r) WHERE rk = 1),
         ab AS (SELECT a4.doc_id, s4, s5,
                         a4.doc_id % 4 AS m4, a4.doc_id % 5 AS m5
                  FROM a4 JOIN a5 ON a4.doc_id = a5.doc_id),
         maps AS (
           SELECT 'ring_n4' AS config, CAST(s4 AS BIGINT) AS shard,
                  CAST(count(*) AS BIGINT) AS n_docs
           FROM ab GROUP BY 2
           UNION ALL
           SELECT 'ring_n5', CAST(s5 AS BIGINT), CAST(count(*) AS BIGINT)
           FROM ab GROUP BY 2),
         moved AS (
           SELECT 'moved_ring' AS config, CAST(-1 AS BIGINT) AS shard,
                  CAST(sum(CASE WHEN s4 <> s5 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_docs
           FROM ab
           UNION ALL
           SELECT 'moved_modulo', CAST(-1 AS BIGINT),
                  CAST(sum(CASE WHEN m4 <> m5 THEN 1 ELSE 0 END) AS BIGINT)
           FROM ab)
         SELECT * FROM maps UNION ALL SELECT * FROM moved
         ORDER BY config, shard"""),

    // Q258: sessionized sequence mining — the top event-type TRIGRAMS
    // across 30-minute sessions: the discovery pass behind funnel
    // design (q77 checks a KNOWN funnel; this finds the candidates).
    // Sessions are the q44 recipe (per-user lag + running gap-flag
    // sum — user-partitioned windows, never global); within a session
    // the type sequence is ordered by (ts, event_id) and consecutive
    // triples roll up map-side. Top-10 by (count desc, triple) is
    // TakeOrdered.
    "q258_sequence_mining" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q258_events")
        s.sql("""
          WITH e AS (SELECT user_id, event_id, event_type,
                            unix_micros(ts) AS ts_us
                     FROM g_q258_events),
          gaps AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w
                                       > 1800000000 THEN 1 ELSE 0 END AS brk
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts_us, event_id)),
          sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sid
                   FROM gaps),
          tri AS (SELECT event_type AS t1,
                         lead(event_type, 1) OVER w2 AS t2,
                         lead(event_type, 2) OVER w2 AS t3
                  FROM sess
                  WINDOW w2 AS (PARTITION BY user_id, sid
                                ORDER BY ts_us, event_id))
          SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
          FROM tri WHERE t3 IS NOT NULL
          GROUP BY 1, 2, 3
          ORDER BY n DESC, t1, t2, t3 LIMIT 10""")
      },
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS ts_us
                    FROM events),
         gaps AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w
                                      > 1800000000 THEN 1 ELSE 0 END AS brk
                  FROM e
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts_us, event_id)),
         sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS sid
                  FROM gaps),
         tri AS (SELECT event_type AS t1,
                        lead(event_type, 1) OVER w2 AS t2,
                        lead(event_type, 2) OVER w2 AS t3
                 FROM sess
                 WINDOW w2 AS (PARTITION BY user_id, sid
                               ORDER BY ts_us, event_id))
         SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
         FROM tri WHERE t3 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY n DESC, t1, t2, t3 LIMIT 10"""),

    // Q259: RFM segmentation — recency/frequency/monetary quintile
    // scores per purchasing user, the classic lifecycle grid. The
    // corpus-sized purchase log collapses into one per-user rollup
    // FIRST; quintile ranks run over the user relation (bounded by
    // |users|, post-shrink — the allowed window tier), scores are the
    // exact integral ((rank−1)·5) div n + 1, and the gate emits the
    // populated segment cells. Reference day = the corpus max event
    // date, so the gate is reproducible at any scale factor.
    "q259_rfm_segments" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q259_events")
        s.sql("""
          WITH p AS (SELECT user_id, unix_micros(ts) AS ts_us,
                            CAST(round(value * 100) AS BIGINT) AS cents
                     FROM g_q259_events WHERE event_type = 'purchase'),
          ref AS (SELECT max(ts_us) AS ref_us FROM p),
          u AS (SELECT user_id,
                       CAST((ref.ref_us - max(ts_us)) div 86400000000
                            AS BIGINT) AS r_days,
                       CAST(count(*) AS BIGINT) AS f_cnt,
                       CAST(sum(cents) AS BIGINT) AS m_cents
                FROM p CROSS JOIN ref GROUP BY user_id, ref.ref_us),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
          scored AS (SELECT user_id,
                       ((row_number() OVER (ORDER BY r_days, user_id) - 1)
                        * 5) div n_users + 1 AS r_score,
                       ((row_number() OVER (ORDER BY f_cnt DESC, user_id)
                         - 1) * 5) div n_users + 1 AS f_score,
                       ((row_number() OVER (ORDER BY m_cents DESC, user_id)
                         - 1) * 5) div n_users + 1 AS m_score
                     FROM u CROSS JOIN n)
          SELECT CAST(r_score AS BIGINT) AS r_score,
                 CAST(f_score AS BIGINT) AS f_score,
                 CAST(m_score AS BIGINT) AS m_score,
                 CAST(count(*) AS BIGINT) AS n_users
          FROM scored GROUP BY 1, 2, 3
          ORDER BY r_score, f_score, m_score""")
      },
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us,
                           CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
         ref AS (SELECT max(ts_us) AS ref_us FROM p),
         u AS (SELECT user_id,
                      CAST((ref.ref_us - max(ts_us)) // 86400000000
                           AS BIGINT) AS r_days,
                      CAST(count(*) AS BIGINT) AS f_cnt,
                      CAST(sum(cents) AS BIGINT) AS m_cents
               FROM p CROSS JOIN ref GROUP BY user_id, ref.ref_us),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
         scored AS (SELECT user_id,
                      ((row_number() OVER (ORDER BY r_days, user_id) - 1)
                       * 5) // n_users + 1 AS r_score,
                      ((row_number() OVER (ORDER BY f_cnt DESC, user_id)
                        - 1) * 5) // n_users + 1 AS f_score,
                      ((row_number() OVER (ORDER BY m_cents DESC, user_id)
                        - 1) * 5) // n_users + 1 AS m_score
                    FROM u CROSS JOIN n)
         SELECT CAST(r_score AS BIGINT) AS r_score,
                CAST(f_score AS BIGINT) AS f_score,
                CAST(m_score AS BIGINT) AS m_score,
                CAST(count(*) AS BIGINT) AS n_users
         FROM scored GROUP BY 1, 2, 3
         ORDER BY r_score, f_score, m_score"""))
}
