package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table fingerprinting — the migration/replication
  * validator: hash every row to a 60-bit digest and combine with
  * commutative aggregates, so two copies of a table compare equal by
  * exchanging a handful of numbers instead of re-sorting 100 TB.
  * Re-partitioning, cluster size, file layout, and row order can never
  * change the answer; any single changed, missing, or duplicated row
  * changes it with overwhelming probability.
  *
  * Two combiners, deliberately both:
  *  - `fp_xor` (bit_xor of digests) — order-independent and
  *    overflow-free, but blind to an even number of identical rows
  *    added or removed (x ⊕ x = 0);
  *  - `fp_sum` (exact decimal sum of digests) — catches multiplicity
  *    changes XOR misses; decimal(38,0) holds 2⁶⁰-scale digests for
  *    ~10¹⁸ rows without overflow, and partial sums merge exactly.
  * Together with `n_rows` they form the usual engine-portable triple.
  *
  * The digest is the repo's standard md5-prefix-60 (TextHash.hash60 /
  * native md5_prefix60) over a canonical `|`-joined rendering the
  * caller fixes to integer/date/string forms — float rendering is NOT
  * portable across engines, so the caller quantizes first.
  *
  * Scale shape: one map-side-combined aggregate; the shuffle carries
  * one partial triple per group per partition. Grouped fingerprints
  * (per shard/day/partition-key) localize a mismatch to the shard that
  * needs re-copying — the bisection step of any 100 TB reconciliation.
  */
object TableChecksum {

  /** Per-group fingerprint triples of the canonical row rendering
    * `concat_ws("|", cols…)`. `groupKeys` empty → one global row.
    */
  def fingerprint(
      df: DataFrame, cols: Seq[Column], groupKeys: Seq[Column]): DataFrame = {
    val digest = graft.llm.TextHash.hash60(concat_ws("|", cols: _*))
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      bit_xor(digest).as("fp_xor"),
      sum(digest.cast("decimal(38,0)")).as("fp_sum"))
    if (groupKeys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupKeys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
