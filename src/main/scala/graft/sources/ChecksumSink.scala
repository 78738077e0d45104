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
    ChecksumSink.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChecksumTable
}

object ChecksumSink {
  /** The sink's declared input: one BIGINT digest column. Spark's
    * output resolution enforces arity/type against this at analysis.
    */
  val schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("v", LongType, nullable = false)))

  /** Committed digests by tag. JVM-local by design: this sink exists
    * to pin the commit protocol in specs/gates, not to be durable.
    */
  final case class Digest(rows: Long, sum: Long, xor: Long)

  private val committed = new ConcurrentHashMap[String, Digest]()

  def result(tag: String): Option[Digest] = Option(committed.get(tag))
  def clear(tag: String): Unit = committed.remove(tag)

  private[sources] def publish(tag: String, d: Digest): Unit =
    committed.put(tag, d)
}

final class ChecksumTable extends Table with SupportsWrite {
  override def name(): String = "graft_checksum_sink"
  override def schema(): StructType = ChecksumSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    require(schema.fields.length == 1 && schema.fields(0).dataType == LongType,
      s"ChecksumSink takes exactly one BIGINT column, got $schema")
    val tag = info.options().getOrDefault("tag", info.queryId())
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChecksumBatchWrite(tag)
      }
    }
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
