package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle a fact table ONCE at write time
  * so every later equi-join / aggregation on the bucket key runs with
  * ZERO exchange on that side — the amortize-the-shuffle move for 100 TB
  * tables that are joined on the same key every day (bucket pruning and
  * shuffle-free joins are why warehouses bucket their biggest facts).
  *
  * Spark mechanics: `bucketBy(n, key).sortBy(key)` writes
  * hash-partitioned, sorted files; the catalog records the layout and
  * FileSourceScanExec reports `HashPartitioning(key, n)`, so a
  * SortMergeJoin of two tables bucketed the same way needs no exchange
  * on either side. Bucket counts must match (or divide) across sides.
  */
object BucketedTables {

  /** Write `df` as a parquet table bucketed+sorted on `bucketCol` at
    * `path` (external location, overwritten if present) and return the
    * catalog-backed scan. Re-invocation overwrites deterministically —
    * callers may use this per-run on fixture data; production writes
    * once per ingest.
    */
  def ensure(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      path: String): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // Repartition on the bucket expression first: HashPartitioning here
    // uses the same Murmur3 hash as the bucket spec, so each task holds
    // exactly one bucket's rows and writes ONE file per bucket instead
    // of the tasks × buckets small-files explosion. (SortMergeJoin
    // still re-sorts the sorted runs — Spark ≥3.0 keeps that behind the
    // legacy bucketedTableScan.outputOrdering flag — but the Exchange,
    // the expensive part, is gone.)
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(table)
    spark.table(table)
  }
}
