package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Exact repeated-substring detection — the character-level
  * generalization of passage dedup ([[PassageDedup]]): find fixed-width
  * character windows whose content recurs in MORE THAN ONE document.
  * This is the shape of suffix-array exact-substring training-data
  * dedup (repeated spans ≥ a length threshold are memorization
  * hazards); a strided rolling window approximates the suffix array
  * with a bounded blow-up (≈ len/stride spans per document) while
  * staying a pure DataFrame plan.
  *
  * Scale design (100 TB): the corpus text itself is NEVER shuffled —
  * each span is reduced map-side to a portable 60-bit content hash
  * ([[TextHash.hash60]]), so the one wide shuffle carries ~16-byte
  * (hash, doc_id) pairs, ≈ len/stride of them per document. The
  * distinct-document count per hash is a two-level aggregate; the span
  * relation feeds both the recurring-hash set and the per-document
  * probe, so it is persisted once ([[CacheScope]]). Window/stride
  * govern recall: stride ≤ window/2 guarantees any repeated run of
  * ≥ window + stride chars shares at least one aligned window.
  */
object ExactSubstrings {

  /** Per-document count of strided `window`-char spans whose hash also
    * occurs in at least one OTHER document. Documents shorter than
    * `window` contribute nothing; documents with no recurring span are
    * absent from the result (join semantics — the caller left-joins
    * against the corpus if zeros are wanted).
    */
  def repeatedSpanCounts(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      window: Int = 40,
      stride: Int = 20): DataFrame = {
    require(window > 0, s"window must be > 0, got $window")
    require(stride > 0, s"stride must be > 0, got $stride")
    val spans = CacheScope.persist(
      docs.filter(length(textCol) >= window)
        .select(idCol.as("doc_id"),
          explode(transform(
            sequence(lit(1), length(textCol) - lit(window - 1), lit(stride)),
            p => substring(textCol, p, lit(window)))).as("sp"))
        .select(col("doc_id"), TextHash.hash60(col("sp")).as("h")))
    val recurring = spans.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1)
      .select("h")
    spans.join(recurring, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_rep_spans"))
  }
}
