package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Exact passage-level deduplication — the corpus-wide "line dedup" of
  * C4/RefinedWeb-style curation, generalized to fixed-size token
  * windows (the fixture corpus has no newlines, so the passage unit is
  * n consecutive tokens instead of a physical line). Every document is
  * split into consecutive n-token passages; passages whose exact text
  * occurs in more than `maxOccur` places across the WHOLE corpus are
  * removed from every document, and the survivors are reassembled in
  * their original order.
  *
  * Scale shape (100 TB): one explode to passage granularity, one
  * map-side-combined count shuffle on the passage text, one equi-join
  * back, one per-document regroup — no all-pairs step anywhere. The
  * passage relation feeds both the count and the join, so it is
  * persisted once ([[graft.CacheScope]]); on a cluster that persist
  * becomes a checkpoint. Boilerplate removal (nav bars, cookie
  * banners, repeated footers) is exactly this operator with a
  * line-shaped splitter.
  */
object PassageDedup {

  /** (doc_id, pos, passage) — consecutive n-token windows per document.
    * The passage array is built in its own projection and exploded in
    * the next one (generator extraction drops aliases inside lambda
    * structs otherwise).
    */
  def passages(docs: DataFrame, docId: Column, text: Column, n: Int): DataFrame = {
    val toks = docs.select(docId.as("doc_id"), split(text, " ").as("toks"))
    // sequence(1, 0) yields a DESCENDING [1, 0] in Spark (not the empty
    // series DuckDB's generate_series gives) — guard the too-short case.
    val nChunks = floor(size(col("toks")) / lit(n)).cast("int")
    val arr = toks.select(
      col("doc_id"),
      when(nChunks > 0,
        transform(
          sequence(lit(1), nChunks),
          i => array_join(
            slice(col("toks"), (i - lit(1)) * lit(n) + lit(1), lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
        .as("passages"))
    arr.select(col("doc_id"), posexplode(col("passages")).as(Seq("pos", "passage")))
  }

  /** Rebuild every document keeping only passages that occur at most
    * `maxOccur` times corpus-wide. Documents whose passages were all
    * duplicates come back with empty text (kept, not dropped — the
    * caller decides the length cutoff).
    */
  def dedup(
      docs: DataFrame,
      docId: Column,
      text: Column,
      n: Int,
      maxOccur: Long): DataFrame = {
    val ch = CacheScope.persist(passages(docs, docId, text, n))
    val keepSet = ch.groupBy("passage")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= maxOccur)
      .select("passage")
    val rebuilt = ch.join(keepSet, Seq("passage"))
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("passage")))),
            x => x.getField("passage")),
          " ").as("new_text"),
        count(lit(1)).as("n_kept"))
    docs.select(docId.as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("new_text"), lit("")).as("new_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
