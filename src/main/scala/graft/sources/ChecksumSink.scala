package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 ladder (the read half is
  * [[RangeSource]]): a sink with REAL two-phase commit semantics and a
  * verifiable result — each task's `DataWriter` folds its rows into an
  * order-independent digest (count, sum, xor over a bigint column),
  * ships it as its `WriterCommitMessage`, and ONLY the driver-side
  * `BatchWrite.commit` publishes the merged digest to a JVM-local
  * registry under the job's `tag` option. `abort` publishes nothing —
  * a failed job leaves NO partial state, which is the entire point of
  * the commit protocol (task partials are speculative until the
  * driver commits; a real sink would move temp files / flip a
  * manifest at exactly this hook, the way the streaming-upsert
  * manifest does).
  *
  * Usage: `df.select(col).write.format("graft.sources.ChecksumSink")
  * .option("tag", "job1").mode("append").save()` then
  * `ChecksumSink.result("job1")`. Input contract: exactly one BIGINT
  * column (project the digest expression upstream — pruning is the
  * caller's job on the write path).
  */
class ChecksumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("clusterByK", false)) ChecksumSink.clusteredSchema
    else ChecksumSink.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChecksumTable(schema)
}

object ChecksumSink {
  /** The sink's declared input: one BIGINT digest column. Spark's
    * output resolution enforces arity/type against this at analysis.
    */
  val schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("v", LongType, nullable = false)))

  /** clusterByK mode: a cluster key + the digest column. */
  val clusteredSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("k", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("v", LongType, nullable = false)))

  /** Committed digests by tag. JVM-local by design: this sink exists
    * to pin the commit protocol in specs/gates, not to be durable.
    */
  final case class Digest(rows: Long, sum: Long, xor: Long)

  private val committed = new ConcurrentHashMap[String, Digest]()

  /** Per-tag streaming epoch state: the RUNNING cumulative digest, the
    * most recent epoch's (id, digest), and a BOUNDED ring of the last
    * [[RecentWindow]] epoch digests — O(1) per tag, not a per-epoch
    * ledger. A long-running query commits millions of epochs; folding
    * a full ledger on every commit would cost O(#epochs) driver time
    * per batch and unbounded memory. The three replay cases Spark's
    * epoch protocol can produce:
    *  - epoch > last: new batch — add to the cumulative;
    *  - epoch == last: replay of the batch in flight — REPLACE
    *    (subtract the old digest, add the new: rows/sum negate, xor is
    *    its own inverse);
    *  - epoch < last: replay of a long-committed batch — ignore, BUT
    *    verify: the ignore is only sound when the source is
    *    DETERMINISTIC (the replayed digest equals what was folded in).
    *    If the replayed epoch is still inside the recent ring and its
    *    digest DIFFERS (non-deterministic source, partitioning changed
    *    across a restart), the stale digest is already baked into the
    *    cumulative with no way to subtract it — so the mismatch is
    *    logged and counted in [[replayMismatches]] for callers to
    *    assert on. Replays older than the ring cannot be verified;
    *    determinism of the source is the sink's API precondition.
    * Registry-level (not StreamingWrite-instance) state: the engine
    * constructs a fresh Write per micro-batch, and epoch idempotence
    * must survive that — and restarts within the JVM.
    */
  private final case class EpochState(
      cum: Digest, lastEpoch: Long, lastDigest: Digest,
      recent: Map[Long, Digest]) {
    def remember(epochId: Long, d: Digest): Map[Long, Digest] = {
      val r = recent + (epochId -> d)
      if (r.size > RecentWindow) r - r.keys.min else r
    }
  }
  private val RecentWindow = 64
  private val epochStates = new ConcurrentHashMap[String, EpochState]()
  private val replayMismatchCounts = new ConcurrentHashMap[String, Long]()
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def result(tag: String): Option[Digest] = Option(committed.get(tag))

  /** Count of older-epoch replays whose digest DIFFERED from the one
    * already folded into the cumulative — each is a determinism-
    * precondition violation the cumulative cannot self-correct.
    */
  def replayMismatches(tag: String): Long =
    Option(replayMismatchCounts.get(tag)).getOrElse(0L)

  def clear(tag: String): Unit = {
    committed.remove(tag)
    epochStates.remove(tag)
    replayMismatchCounts.remove(tag)
  }

  private[sources] def publish(tag: String, d: Digest): Unit =
    committed.put(tag, d)

  /** Epoch-keyed commit: replay-idempotent (see [[EpochState]]), then
    * the cumulative digest across all committed epochs republishes.
    */
  private[sources] def commitEpoch(tag: String, epochId: Long, d: Digest): Unit = {
    // The publish happens INSIDE the compute closure — under the
    // tag's bin lock — so two queries sharing a tag can never publish
    // a stale cumulative (state advanced to epoch N, committed left
    // at N-1 by a late-finishing thread).
    epochStates.compute(tag, (_, prev) => {
      val next =
        if (prev == null)
          EpochState(d, epochId, d, Map(epochId -> d))
        else if (epochId > prev.lastEpoch)
          EpochState(Digest(prev.cum.rows + d.rows, prev.cum.sum + d.sum,
            prev.cum.xor ^ d.xor), epochId, d, prev.remember(epochId, d))
        else if (epochId == prev.lastEpoch)
          EpochState(Digest(
            prev.cum.rows - prev.lastDigest.rows + d.rows,
            prev.cum.sum - prev.lastDigest.sum + d.sum,
            prev.cum.xor ^ prev.lastDigest.xor ^ d.xor), epochId, d,
            prev.remember(epochId, d))
        else {
          prev.recent.get(epochId).foreach { folded =>
            if (folded != d) {
              replayMismatchCounts.merge(tag, 1L, (a, b) => a + b)
              log.error(
                s"ChecksumSink[$tag] epoch $epochId replayed with digest $d "
                  + s"but $folded is already folded into the cumulative — "
                  + "non-deterministic source; cumulative digest is stale")
            }
          }
          prev
        }
      committed.put(tag, next.cum)
      next
    })
    ()
  }
}

final class ChecksumTable(tableSchema: StructType = ChecksumSink.schema)
    extends Table with SupportsWrite {
  override def name(): String = "graft_checksum_sink"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    val tag = info.options().getOrDefault("tag", info.queryId())
    val clustered = info.options().getBoolean("clusterByK", false)
    if (clustered) {
      require(schema.fields.length == 2 &&
        schema.fields.forall(_.dataType == LongType) &&
        schema.fieldNames.sameElements(Array("k", "v")),
        s"clusterByK mode takes columns (k BIGINT, v BIGINT), got $schema")
      val parts = info.options().getInt("numPartitions", 0)
      new WriteBuilder {
        override def build(): Write = new ClusteredChecksumWrite(tag, parts)
      }
    } else {
      require(schema.fields.length == 1 &&
        schema.fields(0).dataType == LongType,
        s"ChecksumSink takes exactly one BIGINT column, got $schema")
      new WriteBuilder {
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new ChecksumBatchWrite(tag)
          override def toStreaming:
              org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new ChecksumStreamingWrite(tag)
        }
      }
    }
  }
}

/** The STREAMING write leg — epoch-keyed two-phase commit: each
  * micro-batch (epoch) merges its task partials under its epochId, and
  * a REPLAYED epoch (restart re-running a committed batch) REPLACES
  * its slot instead of double-counting — per-epoch idempotence is what
  * turns at-least-once batch delivery into an exactly-once aggregate.
  * After every epoch commit the cumulative digest across all committed
  * epochs is re-published under the tag.
  */
final class ChecksumStreamingWrite(tag: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
      override def createWriter(
          partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        new ChecksumWriterFactory().createWriter(partitionId, taskId)
    }

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L; var sum = 0L; var xor = 0L
    messages.foreach { case ChecksumPartial(r, s, x) =>
      rows += r; sum += s; xor ^= x
    }
    // ledger state lives in the tag registry, NOT this instance — the
    // engine constructs a fresh Write per micro-batch
    ChecksumSink.commitEpoch(tag, epochId, ChecksumSink.Digest(rows, sum, xor))
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** The write-side distribution contract
  * (`RequiresDistributionAndOrdering`): the SINK tells Spark how the
  * data must arrive — clustered by `k` (all rows of a key in ONE
  * task), sorted (k, v) within each task, optionally an exact
  * partition count — and Spark plans the exchange + sort to satisfy
  * it. This is how real table formats get layout (partitioned,
  * sorted files) without the caller remembering repartition/sortWithin:
  * the WRITER declares, the ENGINE provides. The writer then VERIFIES
  * the contract at write time: out-of-order rows fail the task (→
  * abort → nothing published), and the driver-side commit re-checks
  * that no key was seen by two tasks before publishing.
  */
final class ClusteredChecksumWrite(tag: String, parts: Int) extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}

  override def requiredDistribution():
      org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.column("k")))

  override def requiredOrdering(): Array[
      org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      Expressions.sort(Expressions.column("k"), SortDirection.ASCENDING),
      Expressions.sort(Expressions.column("v"), SortDirection.ASCENDING))

  override def requiredNumPartitions(): Int = parts

  override def toBatch: BatchWrite = new ClusteredChecksumBatchWrite(tag)
}

final class ClusteredChecksumBatchWrite(tag: String) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ClusteredChecksumWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L; var sum = 0L; var xor = 0L
    // boxed map types: put() returns null for first insertion, and a
    // primitive-typed Scala map would silently unbox that null to 0,
    // making every key first seen by a task other than 0 a false
    // violation
    val owners = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    messages.foreach { case ClusteredPartial(pid, r, s, x, keys) =>
      rows += r; sum += s; xor ^= x
      keys.foreach { k =>
        val prev = owners.put(k, pid)
        require(prev == null || prev.intValue == pid,
          s"clustering violated: key $k seen by tasks $prev and $pid")
      }
    }
    ChecksumSink.publish(tag, ChecksumSink.Digest(rows, sum, xor))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ClusteredPartial(
    partitionId: Int, rows: Long, sum: Long, xor: Long, keys: Array[Long])
    extends WriterCommitMessage

final class ClusteredChecksumWriterFactory extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L; private var sum = 0L; private var xor = 0L
      private var lastK = Long.MinValue; private var lastV = Long.MinValue
      private val keys = scala.collection.mutable.LinkedHashSet.empty[Long]

      override def write(record: InternalRow): Unit = {
        val k = record.getLong(0); val v = record.getLong(1)
        // verify the engine honored requiredOrdering — a violation
        // fails the TASK, the job aborts, and nothing is published
        require(k > lastK || (k == lastK && v >= lastV),
          s"ordering violated: ($k,$v) after ($lastK,$lastV)")
        lastK = k; lastV = v
        keys += k
        rows += 1; sum += v; xor ^= v
      }

      override def commit(): WriterCommitMessage =
        ClusteredPartial(partitionId, rows, sum, xor, keys.toArray)

      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

final class ChecksumBatchWrite(tag: String) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory

  /** The ONLY place results become visible — merge task partials and
    * publish atomically.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L; var sum = 0L; var xor = 0L
    messages.foreach { case ChecksumPartial(r, s, x) =>
      rows += r; sum += s; xor ^= x
    }
    ChecksumSink.publish(tag, ChecksumSink.Digest(rows, sum, xor))
  }

  /** A failed/aborted job publishes nothing. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class ChecksumPartial(rows: Long, sum: Long, xor: Long)
    extends WriterCommitMessage

final class ChecksumWriterFactory extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L; private var sum = 0L; private var xor = 0L

      override def write(record: InternalRow): Unit = {
        val v = record.getLong(0)
        rows += 1; sum += v; xor ^= v
      }

      override def commit(): WriterCommitMessage =
        ChecksumPartial(rows, sum, xor)

      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
