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
    val spans = docs.filter(length(textCol) >= window)
      .select(idCol.as("doc_id"),
        explode(transform(
          sequence(lit(1), length(textCol) - lit(window - 1), lit(stride)),
          p => substring(textCol, p, lit(window)))).as("sp"))
    crossDocCounts(spans, "n_rep_spans")
  }

  /** Per-document count of CONTENT-DEFINED segments shared with at
    * least one other document. Segment boundaries sit where the
    * rolling `gram`-char hash ≡ 0 (mod `modulus`) — a property of the
    * CONTENT, not the offset — so a long run shared by two documents
    * at different offsets still splits into identical segments, the
    * recall case [[repeatedSpanCounts]]'s doc-aligned stride grid
    * misses whenever the offsets disagree mod stride (the rsync/CDC
    * chunking insight; `ExactSubstringsSpec` pins the contrast).
    * Expected segment length ≈ `modulus` chars; `minLen` drops the
    * short segments whose collisions are semantically meaningless.
    * Same scale shape as the strided variant: segments hash map-side,
    * only (hash, doc_id) pairs shuffle.
    */
  def sharedSegmentCounts(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      gram: Int = 8,
      modulus: Int = 16,
      minLen: Int = 20): DataFrame = {
    require(gram > 0, s"gram must be > 0, got $gram")
    require(modulus > 0, s"modulus must be > 0, got $modulus")
    require(minLen > 0, s"minLen must be > 0, got $minLen")
    // interior breakpoints: positions 2..len-gram+1 whose gram-hash
    // lands on the modulus grid (guarded — Spark's sequence() counts
    // DOWN when stop < start, so short docs must yield an empty array)
    val interior = when(length(textCol) >= gram + 1,
      filter(
        sequence(lit(2), length(textCol) - lit(gram - 1)),
        p => pmod(TextHash.hash60(substring(textCol, p, lit(gram))),
          lit(modulus)) === 0))
      .otherwise(array().cast("array<int>"))
    val bounds = concat(array(lit(1)), interior,
      array(length(textCol) + lit(1)))
    val segs = docs
      .select(idCol.as("doc_id"), textCol.as("__t"), bounds.as("__b"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("__b")) - lit(1)),
          i => substring(col("__t"), element_at(col("__b"), i),
            element_at(col("__b"), i + lit(1)) - element_at(col("__b"), i))))
          .as("sp"))
      .filter(length(col("sp")) >= minLen)
    crossDocCounts(segs, "n_rep_segments")
  }

  /** Shared tail: hash the span column map-side, find hashes seen in
    * > 1 distinct document (two-level aggregate), count matches per
    * document. The span relation feeds both consumers → persisted.
    */
  private def crossDocCounts(spans: DataFrame, outCol: String): DataFrame = {
    val hashed = CacheScope.persist(
      spans.select(col("doc_id"), TextHash.hash60(col("sp")).as("h")))
    val recurring = hashed.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1)
      .select("h")
    hashed.join(recurring, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as(outCol))
  }
}
