package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign every document, in a deterministic global
  * order, to a fixed-token-budget training bin —
  * `bin = floor(tokens_before_this_doc / budget)` over the running
  * token total. (A document may straddle its bin boundary; the
  * in-bin splitter downstream handles padding/truncation. What matters
  * here is that every engine, run, and cluster layout agrees on which
  * bin every document starts in.)
  *
  * The naive formulation is a single global window
  * (`sum over (ORDER BY id)`) — ONE partition holding the whole
  * corpus, the canonical scale mistake. This operator computes the
  * same running sum as a two-level distributed prefix sum:
  *
  *   1. coarse buckets (a monotone function of the id) aggregate their
  *      token totals map-side — one small shuffle keyed by bucket;
  *   2. bucket offsets = running sum over the TINY per-bucket relation
  *      (corpus_size / bucketWidth rows — the only single-partition
  *      window, ~25k rows per 1e8 docs; recurse the same trick if that
  *      tier ever gets big);
  *   3. offsets broadcast back; the within-bucket running sum is a
  *      window partitioned BY BUCKET, so no partition ever holds more
  *      than `bucketWidth` rows.
  *
  * Total cost: one bucket-key shuffle + one broadcast — independent of
  * corpus size per partition, and bit-identical to the sequential scan.
  */
object SequencePacker {

  /** @param idCol      dense numeric document order (bucket = id div width)
    * @param nTokCol    per-document token count
    * @param budget     tokens per training bin
    * @param bucketWidth docs per coarse bucket (tune so the offsets
    *        tier stays driver-trivial and in-bucket windows stay small)
    */
  def packBins(
      df: DataFrame,
      idCol: Column,
      nTokCol: Column,
      budget: Long,
      bucketWidth: Long = 4096L): DataFrame = {
    require(budget > 0 && bucketWidth > 0, "budget and bucketWidth must be positive")
    val base = df.select(idCol.cast("long").as("id"), nTokCol.cast("long").as("n_tok"))
      .withColumn("bucket", floor(col("id") / bucketWidth).cast("long"))
    val perBucket = base.groupBy("bucket").agg(sum("n_tok").as("tot"))
    val wOffsets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("offset", coalesce(sum("tot").over(wOffsets), lit(0L)))
      .select("bucket", "offset")
    val wInBucket = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq("bucket"))
      .withColumn("before", col("offset") + coalesce(sum("n_tok").over(wInBucket), lit(0L)))
      .select(col("id"), col("n_tok"),
        floor(col("before") / budget).cast("long").as("bin"))
  }
}
