package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{BpeTrainer, SequencePacker}

/** Tokenizer-training surface: BPE merge fitting (q223), corpus-wide
  * encode accounting (q230), and token-budget shard packing over the
  * BPE counts (q235) — the fit → apply → pack chain every LLM pipeline
  * runs before training. The reference tokenizes nothing; this extends
  * the 100 TB surface next to q28 (token counting), q47 (chunking) and
  * q53 (packing).
  */
object TokenizerQueries {

  /** The 3-round BPE chain as DuckDB CTEs (train on the word-frequency
    * table, exactly `BpeTrainer.fit`), ending in `w3` (final merged
    * sequences) and `vc` (word → post-merge symbol count). Pair
    * positions come from a bounded series (words here are far below 63
    * symbols — the fixture vocabulary tops out at 8 chars; the
    * operator itself has no such bound).
    */
  private val bpeChainSql =
    """tokw AS (SELECT unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS word
                FROM documents),
       w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
                     regexp_replace(word, '(.)', '[\1]', 'g') AS seq
              FROM tokw GROUP BY 1),
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
       m3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1),
       w3 AS (SELECT w2.word, w2.freq,
                     replace(w2.seq, '[' || m3.l || '][' || m3.r || ']',
                             '[' || m3.l || m3.r || ']') AS seq
              FROM w2 CROSS JOIN m3),
       vc AS (SELECT word,
                     CAST(len(string_split(substr(seq, 2, length(seq) - 2),
                                           '][')) AS BIGINT) AS n_sym
              FROM w3)"""

  val specs: Map[String, QuerySpec] = Map(

    // Q223: BPE merge training, 3 rounds (Sennrich et al. 2016). The
    // corpus collapses to a (word, freq) table in ONE corpus-sized
    // shuffle; each round then counts adjacent symbol pairs on the
    // vocabulary-sized relation (pure codegen zip_with — no join, no
    // window, no UDF), takes the (cnt DESC, l, r) winner as a 1-row
    // relation, and broadcast-joins it back to apply replace() over the
    // bracket-delimited symbol sequences. Greedy-leftmost merge
    // semantics ride on non-overlapping left-to-right replace, which
    // both engines share (see BpeTrainer's header note on why the
    // [a][b] encoding makes that exact: adjacent matches share no
    // characters, and a pair can never match inside a longer symbol).
    // The emitted merge table IS the artifact a tokenizer ships.
    "q223_bpe_train" -> QuerySpec(
      (s, dir) =>
        BpeTrainer.train(Tables.documents(s, dir), col("text"), rounds = 3)
          .select(col("round").cast("long").as("step"),
            col("l"), col("r"), col("cnt"), col("token"))
          .orderBy("step"),
      s"""WITH $bpeChainSql
         SELECT CAST(1 AS BIGINT) AS step, l, r, cnt, l || r AS token FROM m1
         UNION ALL
         SELECT CAST(2 AS BIGINT), l, r, cnt, l || r FROM m2
         UNION ALL
         SELECT CAST(3 AS BIGINT), l, r, cnt, l || r FROM m3
         ORDER BY step"""),

    // Q230: BPE ENCODE — apply the trained merges back to the corpus
    // and account the result per language: word count, character
    // count, and post-merge token count (the number a token-budget
    // planner actually needs). Scale shape: the trained vocabulary
    // (word → merged symbol count, ~10⁷ rows at web scale, built by
    // the q223 machinery without ever touching the corpus again)
    // joins the corpus token stream on the word — one equi-join + one
    // map-side-combined rollup; the merge rules themselves never
    // touch corpus rows. Compression shows up as n_tokens < n_chars
    // exactly where the learned merges fire.
    "q230_bpe_encode" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val trained = BpeTrainer.fit(docs, col("text"), rounds = 3)._2
        val vc = trained.select(col("word"),
          expr("""CAST(size(split(substring(seq, 2, length(seq) - 2),
                                 '\\]\\[')) AS BIGINT)""").as("n_sym"))
        val occ = docs.select(col("lang"),
          explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
        occ.join(vc, Seq("word"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            sum(length(col("word"))).as("n_chars"),
            sum(col("n_sym")).as("n_tokens"))
          .select(col("lang"), col("n_words").cast("long").as("n_words"),
            col("n_chars").cast("long").as("n_chars"),
            col("n_tokens").cast("long").as("n_tokens"))
          .orderBy("lang")
      },
      s"""WITH $bpeChainSql,
         occ AS (SELECT lang, unnest(list_filter(string_split(text, ' '),
                                                 x -> x <> '')) AS word
                 FROM documents)
         SELECT o.lang, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(length(o.word)) AS BIGINT) AS n_chars,
                CAST(sum(vc.n_sym) AS BIGINT) AS n_tokens
         FROM occ o JOIN vc ON o.word = vc.word
         GROUP BY 1 ORDER BY 1"""),

    // Q235: token-budget shard packing over the BPE counts — the
    // capstone of the fit → encode → pack chain: per-document
    // post-merge token counts (corpus token stream ⋈ trained vocab,
    // one rollup) feed SequencePacker's two-level distributed prefix
    // sum, so every document lands in bin = floor(tokens_before/512)
    // of the global doc_id order WITHOUT any single-partition window
    // over the corpus (the q53/q197 rule). The per-bin summary —
    // doc count, token total, id span — is what a shard manifest
    // records. Oracle: the same running sum as one sequential window.
    "q235_bpe_shard_packing" -> QuerySpec(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val trained = BpeTrainer.fit(docs, col("text"), rounds = 3)._2
        val vc = trained.select(col("word"),
          expr("""CAST(size(split(substring(seq, 2, length(seq) - 2),
                                 '\\]\\[')) AS BIGINT)""").as("n_sym"))
        val perDoc = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .join(vc, Seq("word"))
          .groupBy("doc_id")
          .agg(sum("n_sym").as("n_tok"))
        SequencePacker.packBins(perDoc, col("doc_id"), col("n_tok"),
          budget = 512L)
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"),
            min("id").as("first_doc"), max("id").as("last_doc"))
          .select(col("bin").cast("long").as("bin"),
            col("n_docs").cast("long").as("n_docs"),
            col("tokens").cast("long").as("tokens"),
            col("first_doc").cast("long").as("first_doc"),
            col("last_doc").cast("long").as("last_doc"))
          .orderBy("bin")
      },
      s"""WITH $bpeChainSql,
         occ AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                                   x -> x <> '')) AS word
                 FROM documents),
         dt AS (SELECT o.doc_id, CAST(sum(vc.n_sym) AS BIGINT) AS n_tok
                FROM occ o JOIN vc ON o.word = vc.word GROUP BY 1),
         run AS (SELECT doc_id, n_tok,
                        CAST(sum(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - n_tok
                             AS BIGINT) AS tok_before
                 FROM dt),
         b AS (SELECT doc_id, n_tok,
                      CAST(tok_before // 512 AS BIGINT) AS bin FROM run)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS tokens,
                CAST(min(doc_id) AS BIGINT) AS first_doc,
                CAST(max(doc_id) AS BIGINT) AS last_doc
         FROM b GROUP BY 1 ORDER BY 1""")
  )
}
