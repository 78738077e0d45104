package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality filter: train a bigram model ON the corpus, score every
  * document by how expected its token transitions are, and flag the
  * tail. Out-of-distribution documents (boilerplate explosions,
  * wrong-language fragments, mojibake) score low because their
  * transitions are rare under the corpus statistics.
  *
  * Determinism contract: the usual perplexity (geometric mean of
  * p(b|a)) rides on libm `ln` doubles — the one construct the q185
  * postmortem showed is NOT bit-portable across engines. This scorer
  * therefore uses the ARITHMETIC mean of the per-transition
  * probability, each probability an exact integer rational in ppm:
  *
  *   p_ppm(a,b) = (c₂(a,b) + 1)·10⁶ div (c₁(a) + V)     (add-1 smoothing)
  *   score(doc) = Σ p_ppm over the doc's bigram occurrences div n_bigrams
  *
  * Same ordering signal for the filtering decision (rare transitions
  * drag the mean down), zero floats anywhere. The 10⁶-scaled product
  * routes through DECIMAL(38,0) so it cannot wrap at any corpus size
  * (round-9 advice on ppm arithmetic).
  *
  * Scale shape: c₂/c₁ are vocabulary-sized aggregates with map-side
  * combine; scoring joins each bigram occurrence to its two counts by
  * equi-key (the count relations are vocab-sized — broadcastable for
  * natural-language vocabularies); the vocabulary size V is a 1-row
  * broadcast. One shuffle keyed on the bigram, one on the prefix
  * token, one per-doc rollup — no all-pairs, no global sort.
  */
object NgramLm {

  /** (doc_id, a, b) bigram occurrences of the whitespace token stream;
    * documents with fewer than two tokens contribute no rows.
    */
  def bigrams(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"),
      filter(split(textCol, " "), x => x =!= "").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
           i -> named_struct('a', element_at(ws, i),
                             'b', element_at(ws, i + 1)))""")).as("e"))
      .select(col("doc_id"), col("e.a").as("a"), col("e.b").as("b"))

  /** Per-document LM score: (doc_id, n_bigrams, mean_p_ppm), only for
    * documents with at least one bigram.
    */
  def scoreDocs(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // r19 §2.4 note: persisting `big` (it feeds c2, c1, and the probe
    // side) and broadcast-hinting c2/c1 were both MEASURED here and
    // regressed or tied (persist 1.65→3.05 s, bcast-only ≈ tie, bench
    // protocol): the bigram relation is occurrence-sized, so the cache
    // write+read costs more than re-running the codegen'd split+explode
    // from the column-pruned scan, and a bigram-TYPE-count broadcast is
    // not driver-safe at corpus scale anyway. Left as shuffle joins —
    // the shape that also holds at 100 TB.
    val big = bigrams(docs, idCol, textCol)
    val c2 = big.groupBy("a", "b").agg(count(lit(1)).cast("long").as("c2"))
    val c1 = big.groupBy("a").agg(count(lit(1)).cast("long").as("c1"))
    val vocab = docs
      .select(explode(filter(split(textCol, " "), x => x =!= "")).as("t"))
      .agg(count_distinct(col("t")).cast("long").as("vocab"))
    big
      .join(c2, Seq("a", "b"))
      .join(c1, Seq("a"))
      .crossJoin(broadcast(vocab))
      .withColumn("p_ppm", expr(
        "CAST((CAST(c2 + 1 AS DECIMAL(38,0)) * 1000000) div (c1 + vocab) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum("p_ppm").cast("long").as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("CAST(__s div n_bigrams AS BIGINT)").as("mean_p_ppm"))
  }
}
