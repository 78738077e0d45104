package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.{HybridRetrieval, NgramLm, Similarity}

/** Round-10 session-3 retrieval/quality surface: corpus-trained n-gram
  * LM scoring (q241 — the CCNet-style perplexity filter, integerized)
  * and hybrid lexical+dense retrieval fused by reciprocal rank (q242 —
  * what production RAG/search stacks actually run).
  */
object RetrievalQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q241: bigram-LM quality scoring — train add-1-smoothed bigram
    // statistics ON the corpus in two vocabulary-sized aggregates,
    // score every document by its mean transition probability (exact
    // ppm rationals, [[NgramLm]]'s integral surrogate for perplexity
    // — no libm ln anywhere), and surface the 15 most surprising
    // documents, the candidates a curation pass reviews or drops. The
    // global worst-15 is TakeOrdered (per-partition top-k + merge),
    // never a full sort.
    "q241_ngram_lm_score" -> QuerySpec(
      (s, dir) =>
        NgramLm.scoreDocs(Tables.documents(s, dir), col("doc_id"), col("text"))
          .orderBy("mean_p_ppm", "doc_id").limit(15),
      """WITH d AS (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       x -> x <> '') AS ws
                    FROM documents),
         big0 AS (SELECT doc_id,
                         unnest(list_transform(
                           generate_series(1, len(ws) - 1),
                           i -> ws[i] || ' ' || ws[i+1])) AS ab
                  FROM d WHERE len(ws) >= 2),
         big AS (SELECT doc_id, string_split(ab, ' ')[1] AS a,
                        string_split(ab, ' ')[2] AS b
                 FROM big0),
         c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c2
                FROM big GROUP BY 1, 2),
         c1 AS (SELECT a, CAST(count(*) AS BIGINT) AS c1
                FROM big GROUP BY 1),
         v AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS vocab
               FROM (SELECT unnest(ws) AS t FROM d)),
         p AS (SELECT big.doc_id,
                      CAST((CAST(c2.c2 + 1 AS HUGEINT) * 1000000)
                        // (c1.c1 + v.vocab) AS BIGINT) AS p_ppm
               FROM big
               JOIN c2 ON big.a = c2.a AND big.b = c2.b
               JOIN c1 ON big.a = c1.a
               CROSS JOIN v),
         per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                        CAST(sum(p_ppm) AS BIGINT) AS s
                 FROM p GROUP BY 1)
         SELECT doc_id, n_bigrams,
                CAST(s // n_bigrams AS BIGINT) AS mean_p_ppm
         FROM per ORDER BY mean_p_ppm, doc_id LIMIT 15"""),

    // Q242: hybrid retrieval — a dense leg (exact integer-quantized
    // cosine top-20 from embeddings, broadcast query side) and a
    // lexical leg (idf-weighted distinct-token overlap top-20 via the
    // posting-list equi-join) fused by [[HybridRetrieval.rrfFuse]]
    // (10⁶ div (60+rank), exact integers). The legs deliberately
    // cover DIFFERENT corpora slices at sf0.1 (only 2 of 5 documents
    // have embeddings) — RRF's absent-leg handling is the point:
    // candidates reachable by either leg fuse on ranks alone, no
    // score calibration. Per-leg windows are WindowGroupLimit-bounded
    // (20 per query); the fusion joins only |queries|·k rows.
    "q242_rrf_hybrid" -> QuerySpec(
      (s, dir) => {
        val qids = Seq(2L, 7L, 13L)
        val emb = Tables.embeddings(s, dir)
        val docs = Tables.documents(s, dir)
        val dense = Similarity.bruteForceTopK(
          emb.filter(col("vec_id").isin(qids: _*)),
          emb.filter(!col("vec_id").isin(qids: _*)),
          "vec_id", "embedding", k = 20)
          .select(col("query_id"), col("candidate_id"), col("rank"))
        // tok feeds THREE consumers (doc-freq, query side, candidate
        // side) — persist so the split+distinct+explode runs once
        val tok = graft.CacheScope.persist(
          docs.select(col("doc_id"),
            explode(array_distinct(
              filter(split(col("text"), " "), x => x =!= ""))).as("t")))
        val dfRel = tok.groupBy("t")
          .agg(count(lit(1)).cast("long").as("df"))
        val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
        val idf = dfRel.crossJoin(broadcast(nDocs))
          .withColumn("idf_ppm", expr(
            "CAST((CAST(n_docs AS DECIMAL(38,0)) * 1000000) div df AS BIGINT)"))
          .select("t", "idf_ppm")
        val qtok = tok.filter(col("doc_id").isin(qids: _*))
          .select(col("doc_id").as("query_id"), col("t"))
        val ctok = tok.filter(!col("doc_id").isin(qids: _*))
          .select(col("doc_id").as("candidate_id"), col("t"))
        // §3.1: the query side (|queries| docs' tokens) and the idf
        // vocabulary are both small by construction — broadcast them so
        // the corpus-sized candidate token relation never shuffles
        val lex = ctok.join(broadcast(qtok), "t").join(broadcast(idf), "t")
          .groupBy("query_id", "candidate_id")
          .agg(sum("idf_ppm").cast("long").as("score"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(desc("score"), col("candidate_id"))))
          .filter(col("rank") <= 20)
          .select("query_id", "candidate_id", "rank")
        HybridRetrieval.rrfFuse(Seq("dense" -> dense, "lex" -> lex))
          .withColumn("rank_fused", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(desc("rrf_ppm"), col("candidate_id"))))
          .filter(col("rank_fused") <= 10)
          .select(col("query_id").cast("long").as("query_id"),
            col("candidate_id").cast("long").as("candidate_id"),
            col("rank_fused").cast("long").as("rank_fused"),
            col("rrf_ppm"), col("rank_dense"), col("rank_lex"))
          .orderBy("query_id", "rank_fused")
      },
      """WITH qv AS (SELECT vec_id,
                            list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS e
                     FROM embeddings WHERE vec_id IN (2, 7, 13)),
         cv AS (SELECT vec_id,
                       list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS e
                FROM embeddings WHERE vec_id NOT IN (2, 7, 13)),
         qn AS (SELECT vec_id, e,
                       CAST(list_sum(list_transform(e, x -> x*x)) AS BIGINT) AS n
                FROM qv),
         cn AS (SELECT vec_id, e,
                       CAST(list_sum(list_transform(e, x -> x*x)) AS BIGINT) AS n
                FROM cv),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                      CAST(CAST(list_sum(list_transform(list_zip(q.e, c.e),
                                                        p -> p[1]*p[2]))
                                AS BIGINT) AS DOUBLE)
                        / (sqrt(CAST(q.n AS DOUBLE))
                           * sqrt(CAST(c.n AS DOUBLE))) AS cosine
                    FROM cn c CROSS JOIN qn q),
         dense AS (SELECT query_id, candidate_id, rank_dense FROM
                   (SELECT query_id, candidate_id,
                           row_number() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, candidate_id) AS rank_dense
                    FROM scored) WHERE rank_dense <= 20),
         tok AS (SELECT doc_id,
                        unnest(list_distinct(
                          list_filter(string_split(text, ' '),
                                      x -> x <> ''))) AS t
                 FROM documents),
         dfr AS (SELECT t, CAST(count(*) AS BIGINT) AS df
                 FROM tok GROUP BY 1),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         idf AS (SELECT t, CAST((CAST(n_docs AS HUGEINT) * 1000000) // df
                                AS BIGINT) AS idf_ppm
                 FROM dfr CROSS JOIN nd),
         qt AS (SELECT doc_id AS query_id, t FROM tok
                WHERE doc_id IN (2, 7, 13)),
         ct AS (SELECT doc_id AS candidate_id, t FROM tok
                WHERE doc_id NOT IN (2, 7, 13)),
         lexs AS (SELECT query_id, candidate_id,
                         CAST(sum(idf_ppm) AS BIGINT) AS score
                  FROM qt JOIN ct USING (t) JOIN idf USING (t)
                  GROUP BY 1, 2),
         lex AS (SELECT query_id, candidate_id, rank_lex FROM
                 (SELECT query_id, candidate_id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, candidate_id) AS rank_lex
                  FROM lexs) WHERE rank_lex <= 20),
         keys AS (SELECT query_id, candidate_id FROM dense
                  UNION SELECT query_id, candidate_id FROM lex),
         fused AS (SELECT k.query_id, k.candidate_id,
                          COALESCE(1000000 // (60 + d.rank_dense), 0)
                            + COALESCE(1000000 // (60 + l.rank_lex), 0)
                            AS rrf_ppm,
                          COALESCE(d.rank_dense, 0) AS rank_dense,
                          COALESCE(l.rank_lex, 0) AS rank_lex
                   FROM keys k
                   LEFT JOIN dense d ON d.query_id = k.query_id
                     AND d.candidate_id = k.candidate_id
                   LEFT JOIN lex l ON l.query_id = k.query_id
                     AND l.candidate_id = k.candidate_id),
         outq AS (SELECT query_id, candidate_id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY rrf_ppm DESC, candidate_id)
                           AS rank_fused,
                         rrf_ppm, rank_dense, rank_lex
                  FROM fused)
         SELECT CAST(query_id AS BIGINT) AS query_id,
                CAST(candidate_id AS BIGINT) AS candidate_id,
                CAST(rank_fused AS BIGINT) AS rank_fused,
                CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
                CAST(rank_dense AS BIGINT) AS rank_dense,
                CAST(rank_lex AS BIGINT) AS rank_lex
         FROM outq WHERE rank_fused <= 10
         ORDER BY query_id, rank_fused"""))
}
