package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.BpeTrainer

/** Tokenizer-training surface: BPE merge fitting (q223) — the
  * vocabulary-building step every LLM pipeline runs before token
  * counting/chunking/packing consume its output. The reference
  * tokenizes nothing; this extends the 100 TB surface next to q28
  * (token counting), q47 (chunking) and q53 (packing).
  */
object TokenizerQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q223: BPE merge training, 3 rounds (Sennrich et al. 2016). The
    // corpus collapses to a (word, freq) table in ONE corpus-sized
    // shuffle; each round then counts adjacent symbol pairs on the
    // vocabulary-sized relation (pure codegen zip_with — no join, no
    // window), takes the (cnt DESC, l, r) winner as a 1-row relation,
    // and broadcast-joins it back to apply replace() over the
    // bracket-delimited symbol sequences. Greedy-leftmost merge
    // semantics ride on non-overlapping left-to-right replace, which
    // both engines share (see BpeTrainer's header note on why the
    // [a][b] encoding makes that exact: adjacent matches share no
    // characters, and a pair can never match inside a longer symbol).
    // The emitted merge table IS the artifact a tokenizer ships.
    // Oracle: the same three rounds unrolled as CTEs; pair positions
    // come from a bounded series (words here are far below 63 symbols
    // — the fixture vocabulary tops out at 8 chars, and the operator
    // itself has no such bound).
    "q223_bpe_train" -> QuerySpec(
      (s, dir) =>
        BpeTrainer.train(Tables.documents(s, dir), col("text"), rounds = 3)
          .select(col("round").cast("long").as("step"),
            col("l"), col("r"), col("cnt"), col("token"))
          .orderBy("step"),
      """WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
                                                x -> x <> '')) AS word
                      FROM documents),
         w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
                       regexp_replace(word, '(.)', '[\1]', 'g') AS seq
                FROM tok GROUP BY 1),
         s1 AS (SELECT freq, string_split(substr(seq, 2, length(seq) - 2),
                                          '][') AS syms FROM w0),
         p1 AS (SELECT syms[g.p] AS l, syms[g.p + 1] AS r,
                       CAST(sum(freq) AS BIGINT) AS cnt
                FROM s1 CROSS JOIN generate_series(1, 63) g(p)
                WHERE g.p + 1 <= len(syms) GROUP BY 1, 2),
         m1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
         w1 AS (SELECT w0.word, w0.freq,
                       replace(w0.seq, '[' || m1.l || '][' || m1.r || ']',
                               '[' || m1.l || m1.r || ']') AS seq
                FROM w0 CROSS JOIN m1),
         s2 AS (SELECT freq, string_split(substr(seq, 2, length(seq) - 2),
                                          '][') AS syms FROM w1),
         p2 AS (SELECT syms[g.p] AS l, syms[g.p + 1] AS r,
                       CAST(sum(freq) AS BIGINT) AS cnt
                FROM s2 CROSS JOIN generate_series(1, 63) g(p)
                WHERE g.p + 1 <= len(syms) GROUP BY 1, 2),
         m2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
         w2 AS (SELECT w1.word, w1.freq,
                       replace(w1.seq, '[' || m2.l || '][' || m2.r || ']',
                               '[' || m2.l || m2.r || ']') AS seq
                FROM w1 CROSS JOIN m2),
         s3 AS (SELECT freq, string_split(substr(seq, 2, length(seq) - 2),
                                          '][') AS syms FROM w2),
         p3 AS (SELECT syms[g.p] AS l, syms[g.p + 1] AS r,
                       CAST(sum(freq) AS BIGINT) AS cnt
                FROM s3 CROSS JOIN generate_series(1, 63) g(p)
                WHERE g.p + 1 <= len(syms) GROUP BY 1, 2),
         m3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS step, l, r, cnt, l || r AS token FROM m1
         UNION ALL
         SELECT CAST(2 AS BIGINT), l, r, cnt, l || r FROM m2
         UNION ALL
         SELECT CAST(3 AS BIGINT), l, r, cnt, l || r FROM m3
         ORDER BY step""")
  )
}
