package graft.llm

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (new-vs-existing-corpus) deduplication: keep only the
  * incoming rows whose key does not already exist in the corpus.
  *
  * The naive plan is a left-anti join that shuffles ALL of the incoming
  * data by key. At corpus-refresh scale the incoming batch is almost
  * entirely new, so that shuffle moves data only to discard nothing.
  * This operator routes around it with a Bloom filter over the corpus
  * keys, built distributed (`stat.bloomFilter` tree-aggregates per
  * partition) and shipped to every task as a foldable binary literal:
  *
  *   - bloom says NO  -> the key is definitely absent from the corpus:
  *     the row passes MAP-SIDE, no shuffle at all;
  *   - bloom says MAYBE (true dups + fpp false positives) -> only this
  *     small fraction takes the exact left-anti join.
  *
  * The output is exact — the bloom is a router, never the decision.
  * Membership runs inside codegen through the engine's own
  * BloomFilterMightContain expression (registered as
  * `graft_might_contain` by GraftExtensions), not a deserializing UDF.
  *
  * Scale notes: sketch size is ~1.2 GB per 1e9 corpus keys at 1% fpp —
  * at that point build it once per refresh cycle and persist it beside
  * the corpus rather than re-aggregating; the anti-join's corpus side
  * should be the corpus' bucketed key table so the residual join
  * co-locates without reshuffling the corpus.
  */
object IncrementalDedup {

  /** `incoming` rows whose `keyCol` (a bigint content key, e.g.
    * TextHash.hash60 of the normalized text) never occurs in `corpus`.
    * Duplicates *within* `incoming` are all kept — intra-batch dedup is
    * Dedup.dropExact's job, run after this router.
    */
  def newOnly(
      incoming: DataFrame,
      corpus: DataFrame,
      keyCol: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = corpus.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bytes = {
      val out = new ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    // stat.bloomFilter inserts long keys via putLong; the expression
    // probes via mightContainLong — same hash path, so the two halves
    // agree bit-for-bit.
    val maybeSeen = call_function("graft_might_contain", lit(bytes), col(keyCol))
    val definitelyNew = incoming.filter(!maybeSeen)
    val candidates = incoming.filter(maybeSeen)
    val verifiedNew = candidates.join(
      corpus.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew.select(incoming.columns.map(col): _*))
  }
}
