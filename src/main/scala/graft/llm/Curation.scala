package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** Corpus-curation operators for training-data pipelines: deterministic
  * train/val/test splitting, within-document repetition scoring (the
  * classic repeated-n-gram quality filter), and benchmark
  * decontamination (n-gram overlap against a held-out eval set). All
  * map-only or broadcast-joined — nothing here shuffles the corpus.
  */
object Curation {

  /** Deterministic split bucket in [0, buckets): the engine-portable
    * content hash of a salted key. Stable across runs, engines, and
    * cluster layouts — the property `df.randomSplit` does NOT give you
    * (it reshuffles with the partitioning). Salting the key decouples
    * this split from any other hash use of the same id.
    */
  def splitBucket(key: Column, buckets: Int = 100): Column =
    pmod(hash60(concat(lit("split:"), key.cast("string"))), lit(buckets.toLong))

  /** Bucket → split label with train/val percentages (rest = test). */
  def splitLabel(bucket: Column, trainPct: Int, valPct: Int): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")

  /** Stratified sampling predicate: keep a row iff its content hash
    * lands under the stratum's acceptance threshold. Used to rebalance a
    * corpus toward target per-stratum rates (domain mixing, language
    * rebalancing) in ONE map-side pass — no groupBy, no sampleBy
    * round-trip, and the decision is a pure function of (stratum, key),
    * so it is reproducible across runs, engines, and repartitions, and
    * stable under corpus growth (a kept row stays kept when new rows
    * arrive — the property `df.stat.sampleBy`'s RNG does not give you).
    *
    * Fractions are quantized to 1/10000 so the threshold compare is
    * integer-exact and engine-portable. Unlisted strata are dropped
    * (threshold 0).
    */
  def stratifiedAccept(
      stratum: Column,
      key: Column,
      fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.forall { case (_, f) => f >= 0 && f <= 1 },
      s"fractions must be within [0,1]: $fractions")
    val bucket = pmod(hash60(concat(lit("strat:"), key.cast("string"))), lit(10000L))
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (s, f)) =>
      when(stratum === s, lit(math.round(f * 10000))).otherwise(acc)
    }
    bucket < threshold
  }

  /** Token-budget sampling: admit documents per stratum (language,
    * domain) until the stratum's token budget is reached — the data-
    * mixing step that turns per-source corpora into a target training
    * mix. Admission order is the portable content hash of `key` (then
    * `key` itself as tie-break), so the selected set is a deterministic
    * pseudo-random sample, stable across runs and engines; a document
    * is admitted while the running token total BEFORE it is under the
    * budget (so each stratum overshoots by at most one document).
    *
    * Scale shape: ONE shuffle on the stratum (per-key window state
    * only). Strata counts are small (languages/domains), so the window
    * partitions are corpus-sized: at 100 TB you first pre-aggregate to
    * (stratum, hash-bucket) partials and budget across buckets — same
    * two-tier refinement as [[SequencePacker]]; the per-stratum window
    * here is the semantics both tiers must reproduce.
    */
  def tokenBudgetSample(
      df: DataFrame,
      stratum: Column,
      key: Column,
      nTok: Column,
      budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0),
      s"budgets must be non-negative: $budgets")
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(stratum === s, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(hash60(concat(lit("budget:"), key.cast("string"))), key)
    df.withColumn("cum_before",
      coalesce(
        sum(nTok).over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter(col("cum_before") < budget)
  }

  /** Group-wise top-k: the best `k` rows of every group under an
    * explicit deterministic ordering (callers include a unique
    * tie-break column — see O5). The classic "keep the N best documents
    * per domain/source" curation step. One shuffle on the group key;
    * Spark ≥3.5 pushes the rank filter into the sort as
    * WindowGroupLimit, so each partition keeps only k rows per group
    * during the sort instead of ranking everything first.
    */
  def topKPerGroup(
      df: DataFrame,
      group: Column,
      ordering: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("rank_in_group",
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(group).orderBy(ordering: _*)))
      .filter(col("rank_in_group") <= k)
  }

  /** Within-document repetition: 1 − distinct/total word n-grams.
    * 0 = no repeated n-gram; →1 = the document loops. Short documents
    * (< n words) count as a single gram (ratio 0). Pure per-row
    * expressions — map-only over the corpus, the shape of the
    * repeated-line/paragraph filters used by production quality
    * pipelines.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val w = Dedup.words(text)
    val total = when(size(w) >= n, size(w) - (n - 1)).otherwise(lit(1))
    lit(1.0) - size(Dedup.shingles(text, n)).cast("double") / total.cast("double")
  }

  /** Benchmark decontamination: per corpus document, the count and
    * ratio of its distinct n-gram shingles that appear in the (distinct)
    * shingle set of a benchmark corpus. Returns only contaminated docs
    * (n_overlap > 0): (id, n_shingles, n_overlap, overlap_ratio).
    *
    * The benchmark side is broadcast — eval suites are tiny next to a
    * training corpus, so the corpus-side work is an explode plus a
    * broadcast hash probe and a map-side-combined count; the corpus is
    * never shuffled by content. Both sides probe on the 60-bit content
    * hash (the portable md5 chain → native `md5_prefix60` under
    * [[graft.GraftExtensions]]) rather than the shingle string: long
    * join keys, and the broadcast ships 8-byte hashes instead of
    * n-gram text.
    */
  def contamination(
      corpus: DataFrame,
      corpusId: Column,
      corpusText: Column,
      benchmarkText: DataFrame,
      benchTextCol: Column,
      n: Int = 3): DataFrame = {
    val bench = benchmarkText
      .select(explode(Dedup.shingleHashes(benchTextCol, n)).as("__h"))
      .distinct()
    // The cache boundary is load-bearing, not just a re-use cache:
    // without it, CollapseProject inlines the shingle+hash chain into
    // the generator AND the filters Catalyst infers around the explode
    // (`size(..)>0`, join-key `isnotnull`), evaluating the interpreted
    // HOF chain ~4× per row (measured 10 s → 1 s at sf0.1). Cached, the
    // inferred filters run against the materialized attribute.
    val hashed = graft.CacheScope.persist(
      corpus.select(corpusId.as("id"), Dedup.shingleHashes(corpusText, n).as("__hs")))
    val posting = hashed
      .select(col("id"), size(col("__hs")).as("n_shingles"),
        explode(col("__hs")).as("__h"))
    posting.join(broadcast(bench), "__h")
      .groupBy("id")
      .agg(
        first("n_shingles").as("n_shingles"),
        count(lit(1)).as("n_overlap"))
      .withColumn("overlap_ratio",
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
  }
}
