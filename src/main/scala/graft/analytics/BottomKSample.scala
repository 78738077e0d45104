package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextHash

/** Mergeable bottom-k uniform sampling and sample quantiles — the
  * deterministic cousin of reservoir sampling: keep the k rows whose
  * md5 key-hash is smallest. Because "bottom-k of a union = bottom-k
  * of the merged bottom-ks", the sample is a mergeable sketch —
  * per-shard samples roll up into a corpus sample without re-reading
  * rows, and the SAME rows are chosen under any partitioning, any row
  * order, any engine (md5 is the portability contract, as everywhere
  * in this repo). Spark executes the bottom-k as TakeOrdered:
  * per-partition top-k heaps then a k-sized merge — no global sort.
  *
  * Quantiles from the sample are order statistics of 256-ish rows —
  * estimator error ~1/√k — next to the EXACT nearest-rank quantile
  * computed scale-safely: group by value (the distinct-value relation
  * is data-bounded, usually ≪ rows), take a distributed running sum
  * ([[DistributedOrder]] — never a single-partition window over the
  * corpus), and pick the first value whose cumulative count reaches
  * the target rank.
  */
object BottomKSample {

  /** The k rows of `df` with the smallest 60-bit md5 hash of
    * `keyRendering` (a unique row key the caller renders as a
    * string). Adds the hash as `__h`; ties (structurally ~impossible
    * at 60 bits, but determinism is a contract here) break on the
    * remaining sort columns the caller appends downstream.
    */
  def sample(df: DataFrame, keyRendering: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    df.withColumn("__h", TextHash.hash60(keyRendering))
      .orderBy("__h").limit(k)
  }

  /** Nearest-rank sample quantiles: for each q (percent), the value at
    * 0-based index `(k'−1)·q div 100` of the sample sorted by
    * (`valueCol`, `__h`) — where k' is the sample's ACTUAL row count,
    * not the nominal k: an input smaller than the requested sample
    * size yields a sample of every row, and deriving indices from the
    * nominal k would target rows that don't exist and silently drop
    * quantiles. The window runs over the sample relation (at most k
    * rows) — post-shrink by construction.
    *
    * @param k the nominal sample size the caller requested — retained
    *          for call-site symmetry with [[sample]]; indices come
    *          from the actual count.
    */
  def sampleQuantiles(
      sampled: DataFrame, valueCol: Column, k: Int,
      qs: Seq[Int]): DataFrame = {
    // k' rides the SAME window pass as the row index (unbounded frame
    // over the identical spec) — a separate count aggregation over an
    // un-persisted `sampled` would recompute the bottom-k sort/limit a
    // second time, one extra full job per call. Both run over the
    // sample relation (≤ k rows), so the single-partition window is
    // post-shrink by construction.
    val w = Window.orderBy(valueCol, col("__h"))
    val sord = sampled
      .withColumn("__i", row_number().over(w) - 1)
      .withColumn("__k", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qdf = qs.foldLeft(Option.empty[DataFrame]) { (acc, q) =>
      val one = sampled.sparkSession.range(1)
        .select(lit(q.toLong).as("q_pct"))
      Some(acc.map(_.unionByName(one)).getOrElse(one))
    }.get
    sord.join(broadcast(qdf),
        col("__i") === expr("((__k - 1) * q_pct) div 100"))
      .select(col("q_pct"), valueCol.cast("long").as("est"))
  }

  /** EXACT nearest-rank quantiles of `valueCol` (1-based rank
    * `(n−1)·q div 100 + 1`), via the distinct-value cumulative count —
    * the scale-safe formulation (no corpus-wide window; the one
    * low-parallelism step is [[DistributedOrder]]'s tiny offset
    * tier). Returns (q_pct, exact).
    */
  def exactQuantiles(
      df: DataFrame, valueCol: Column, qs: Seq[Int]): DataFrame = {
    val vals = df.groupBy(valueCol.as("__v"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val cum = DistributedOrder
      .withRunningSum(vals, Seq(col("__v")), col("__c"), "__excl")
      .withColumn("__cum", col("__excl") + col("__c"))
    // r19 note: deriving n as Σ __c over `vals` (hoping AQE exchange
    // reuse would share the vals shuffle with `cum`) was measured and
    // does NOT reuse — n feeds a broadcast subquery, which plans in
    // its own adaptive context (exec-mode plan audit: 0 ReusedExchange)
    // — so that formulation just swaps a cheap count scan for a full
    // groupBy pass. Kept as the direct count.
    val n = df.agg(count(lit(1)).cast("long").as("__n"))
    val targets = qs.foldLeft(Option.empty[DataFrame]) { (acc, q) =>
      val one = df.sparkSession.range(1).select(lit(q.toLong).as("q_pct"))
      Some(acc.map(_.unionByName(one)).getOrElse(one))
    }.get
      .crossJoin(broadcast(n))
      .select(col("q_pct"),
        expr("((__n - 1) * q_pct) div 100 + 1").as("__r"))
    cum.join(broadcast(targets), col("__cum") >= col("__r"))
      .groupBy("q_pct")
      .agg(min(col("__v")).cast("long").as("exact"))
  }
}
