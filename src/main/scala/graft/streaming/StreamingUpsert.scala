package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The `foreachBatch` upsert sink — the standard production pattern for
  * landing a CDC stream in a keyed snapshot when the sink has no native
  * MERGE: each microbatch is compacted against the previous snapshot
  * with last-writer-wins semantics and written to a fresh versioned
  * directory (ping-pong — never read and overwrite the same files in
  * one job).
  *
  * Deletes are retained as TOMBSTONES in the snapshot rather than
  * dropped, which makes the per-batch merge ASSOCIATIVE and
  * commutative across batches: a delete at sequence 10 arriving in an
  * earlier microbatch than an upsert at sequence 5 still wins, so the
  * final snapshot is independent of how the source splits files into
  * batches. Readers filter tombstones at the end ([[finalSnapshot]]).
  * Production adds tombstone expiry after the out-of-order horizon.
  *
  * Scale shape: each merge is ONE hash shuffle on the key with
  * WindowGroupLimit keeping one row of state per key; the snapshot
  * rewrite is the compaction write a MERGE-less sink pays. State lives
  * in the snapshot files, not in stream state — no watermark needed.
  */
object StreamingUpsert {

  /** Last-writer-wins compaction of `prev` (snapshot rows) with
    * `batch` (new change rows). Both carry `keyCol`, payload columns,
    * `__seq` (long, unique per key per producer) and `__op`
    * (upsert/delete). Delete outranks upsert at equal sequence so a
    * duplicated sequence still resolves deterministically.
    */
  def compact(prev: DataFrame, batch: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__seq").desc, col("__op").asc)
    prev.unionByName(batch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Drain `stream` (shaped: keyCol, payload…, __seq, __op) through a
    * foreachBatch merge into versioned snapshot dirs under `dir`.
    * Returns the final snapshot path after the drain completes.
    */
  def mergeStream(
      spark: SparkSession,
      stream: DataFrame,
      dir: String,
      keyCol: String,
      checkpoint: String): String = {
    @volatile var current: Option[String] = None
    val q: StreamingQuery = stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val prev = current.map(spark.read.parquet(_)).getOrElse(batch.limit(0))
        val next = s"$dir/v$id"
        compact(prev, batch, keyCol)
          .coalesce(4).write.mode("overwrite").parquet(next)
        current = Some(next)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
    current.getOrElse(
      throw new IllegalStateException("stream produced no microbatch"))
  }

  /** The reader view of a snapshot: live rows only (tombstones out). */
  def finalSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).filter(col("__op") === "upsert")
}
