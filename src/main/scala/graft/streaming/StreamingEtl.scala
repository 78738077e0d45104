package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{AuditSettings, CollectionMapping, RuntimeConfig, TableSink, Transform}

/** Structured Streaming extension of the batch ETL (SURVEY §2.9 marks
  * streaming out of reference parity; this is the §7.8 design: staged
  * JSONL in → the SAME transform plane → `foreachBatch` through the same
  * [[TableSink]], so batch and stream share one code path and one sink
  * contract).
  */
object StreamingEtl {

  /** Stream a staging directory of JSONL documents through the ETL
    * transform into `sink`. `Trigger.AvailableNow` drains what exists
    * and stops (batch-like test/backfill mode); pass
    * `Trigger.ProcessingTime(...)` for continuous ingestion.
    */
  def run(
      spark: SparkSession,
      stagingDir: String,
      checkpointDir: String,
      collectionName: String,
      cm: CollectionMapping,
      runtime: RuntimeConfig,
      audit: AuditSettings,
      sink: TableSink,
      objectStatus: String = "ALREADY_EXISTS",
      clock: Column = current_timestamp(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .text(stagingDir)
      .withColumnRenamed("value", "raw")
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val tc = Transform.transformCollection(
          batch, "raw", collectionName, cm, runtime, audit, objectStatus, clock)
        sink.append(tc.target, cm.targetTable)
        sink.append(tc.audit, audit.auditTable)
      }
      .start()

  /** Watermarked tumbling-window counts over an event stream — the
    * streaming analog of the audit dashboard's per-date counts (A1/A3):
    * late data beyond the watermark is dropped, state is bounded.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("window_start"),
        col(keyCol), col("cnt"))

  /** Streaming exact dedup with bounded state: drop re-deliveries of the
    * same document id within the watermark horizon (the streaming
    * counterpart of `Dedup.exactDuplicates`).
    */
  def dedupStream(
      docs: DataFrame,
      idCol: String,
      tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)
}
