package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus vocabulary statistics: Zipf coverage curves (what share of
  * the corpus the top-k tokens explain — the tokenizer-budget question),
  * PMI collocation mining (phrase discovery beyond raw bigram counts),
  * and inverted-index construction (the retrieval-side posting lists).
  *
  * Scale shapes: everything is explode → map-side-combined aggregate on
  * the token/pair key; per-key state in the index build is bounded by
  * WindowGroupLimit before any list is collected. Scores avoid libm
  * (no log): PMI is ranked by its exact monotone rational, evaluated as
  * IEEE doubles in a pinned operation order so any engine reproduces
  * the bits.
  */
object Vocabulary {

  private def tokens(text: Column): Column = split(text, " ")

  /** Adjacent-token pairs as structs (w1, w2) — a map-side zip of the
    * token array with its own tail, no shuffle.
    */
  def bigramPairs(text: Column): Column = {
    val toks = tokens(text)
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Top-k tokens with cumulative corpus coverage: (rank, token, cnt,
    * cum_cnt, coverage_e6). One token shuffle with map-side combine;
    * the global top-k is TakeOrderedAndProject; the cumulative window
    * runs over k rows only (driver-bounded, not corpus-bounded).
    */
  def zipfCoverage(docs: DataFrame, text: Column, k: Int): DataFrame = {
    val toks = docs.select(explode(tokens(text)).as("token"))
    // ONE explode pass: the token-count relation is persisted and both
    // the top-k and the corpus total derive from it (an unpersisted
    // total would re-run the explode+aggregate per consumer).
    val counted = graft.CacheScope.persist(
      toks.groupBy("token").agg(count(lit(1)).as("cnt")))
    val total = counted.agg(sum("cnt").as("total"))
    val top = counted
      .orderBy(desc("cnt"), asc("token"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("cnt"), asc("token"))).cast("bigint"))
    top
      .withColumn("cum_cnt",
        sum("cnt").over(Window.orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("cnt"), col("cum_cnt"),
        expr("(cum_cnt * 1000000L) div total").as("coverage_e6"))
  }

  /** Top-k collocations by PMI: (w1, w2, c_xy, score_e6, rank). The
    * score is the PMI argument (c_xy · N_uni²) / (N_big · c_x · c_y)
    * — log-free, monotone in PMI — floored to e6. Unigram counts join
    * onto pair counts by each side's word (vocabulary-sized relations;
    * AQE broadcasts them when small). Operation order is pinned so the
    * double bits are engine-identical.
    */
  def pmiBigrams(docs: DataFrame, text: Column, minCount: Long, k: Int): DataFrame = {
    // One explode pass per relation: totals derive from the persisted
    // count aggregates, not from a second scan of the corpus.
    val cu = graft.CacheScope.persist(
      docs.select(explode(tokens(text)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    val nu = cu.agg(sum("c").as("nu"))
    val cbAll = graft.CacheScope.persist(
      docs.select(explode(bigramPairs(text)).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy")))
    val nb = cbAll.agg(sum("c_xy").as("nb"))
    val cb = cbAll.filter(col("c_xy") >= minCount)
    val scored = cb
      .join(cu.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(cu.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .withColumn("score_e6",
        floor((col("c_xy").cast("double") * col("nu") * col("nu")
          / (col("nb").cast("double") * col("c1") * col("c2")))
          * lit(1000000.0)).cast("long"))
    scored
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score_e6"), asc("w1"), asc("w2"))).cast("bigint"))
      .filter(col("rank") <= k)
      .select("w1", "w2", "c_xy", "score_e6", "rank")
  }

  /** Inverted index with truncated posting heads: (term, doc_freq,
    * postings_head) for terms appearing in ≥ minDf documents. The
    * posting head keeps the `headN` smallest doc ids, enforced by a
    * rank window BEFORE the list aggregate — per-term state is headN
    * rows however hot the term is (an uncapped collect_list on a
    * stopword's posting list is the OOM at corpus scale).
    */
  def invertedIndex(
      docs: DataFrame, id: Column, text: Column,
      minDf: Long, headN: Int): DataFrame = {
    val td = docs.select(id.as("doc_id"), explode(tokens(text)).as("term"))
      .distinct()
    val w = Window.partitionBy("term")
    td
      .withColumn("doc_freq", count(lit(1)).over(w).cast("bigint"))
      .filter(col("doc_freq") >= minDf)
      .withColumn("__rn", row_number().over(w.orderBy("doc_id")))
      .filter(col("__rn") <= headN)
      .groupBy("term", "doc_freq")
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))), _.cast("string")),
        ",").as("postings_head"))
  }
}
