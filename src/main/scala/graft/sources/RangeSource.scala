package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 READ connector — the connector-surface
  * demonstration the parquet/JDBC/Mongo sources don't exercise:
  * `TableProvider` → `SupportsRead` table → `ScanBuilder` implementing
  * BOTH `SupportsPushDownFilters` (id-range predicates narrow the
  * generated interval at PLANNING time — accepted filters do not
  * reappear in the query's post-scan Filter) and
  * `SupportsPushDownRequiredColumns` (the reader materializes only the
  * pruned schema), then a `Batch` that splits the interval into
  * `slices` independent `InputPartition`s for parallel reads.
  *
  * The table is a deterministic integer interval
  * `[start, end) step 1` with schema
  * `(id BIGINT, id_sq BIGINT, bucket BIGINT, label STRING)` where
  * `id_sq = id*id`, `bucket = id mod 16`, `label = 'b' || bucket` —
  * pure functions of `id`, so an external oracle reproduces the whole
  * table from a range generator. Usage:
  * `spark.read.format("graft.sources.RangeSource")
  *   .option("start", 0).option("end", 100000).option("slices", 8)`.
  *
  * Why it matters at 100 TB: V2 pushdown is the contract that keeps a
  * selective query from materializing a table-sized scan out of ANY
  * source (Iceberg/Delta/JDBC follow this exact interface); this
  * in-repo connector pins the mechanics (filter acceptance, residual
  * semantics, pruned output schema, partition planning) with a spec
  * and an oracle gate, independent of a vendor format.
  */
class RangeSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "0").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("id_sq", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("label", org.apache.spark.sql.types.StringType,
      nullable = false)))
}

final class RangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  require(slices > 0, s"slices must be positive, got $slices")

  override def name(): String = s"graft_range[$start,$end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices,
      Option(options.get("maxRowsPerBatch")).map(_.toLong))
}

/** Planning-time state: id-range filters tighten [lo, hi); column
  * pruning keeps the projected subset in declared order.
  */
final class RangeScanBuilder(
    start: Long, end: Long, slices: Int,
    maxRowsPerBatch: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (taken, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    taken.foreach {
      case EqualTo("id", v) =>
        val x = v.asInstanceOf[Number].longValue
        lo = math.max(lo, x); hi = math.min(hi, x + 1)
      case GreaterThan("id", v) =>
        lo = math.max(lo, v.asInstanceOf[Number].longValue + 1)
      case GreaterThanOrEqual("id", v) =>
        lo = math.max(lo, v.asInstanceOf[Number].longValue)
      case LessThan("id", v) =>
        hi = math.min(hi, v.asInstanceOf[Number].longValue)
      case LessThanOrEqual("id", v) =>
        hi = math.min(hi, v.asInstanceOf[Number].longValue + 1)
      case _ => ()
    }
    accepted = taken
    residual // fully handled filters do NOT come back as a post-scan Filter
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(
      RangeSource.schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new RangeScan(lo, hi, slices, required, maxRowsPerBatch)
}

object RangeScan {
  /** Overflow-safe interval slicing: `hi - lo` is checked (a
    * [min_long, max_long) request must fail loudly, not wrap), and
    * slice bounds use base/remainder arithmetic — the naive
    * `lo + n*i/k` overflows `n*i` for intervals near 2^60 with
    * several slices, silently planning negative bounds and dropping
    * rows (round-9 advice). Shared by the batch and streaming planers.
    */
  def slicePartitions(lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    val n =
      if (hi <= lo) 0L
      else try Math.subtractExact(hi, lo) catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"range [$lo, $hi) spans more than 2^63 - 1 ids; split the scan")
      }
    if (n == 0) return Array.empty
    val k = math.min(slices.toLong, n).toInt
    val base = n / k
    val rem = n % k
    // slice i covers [lo + i*base + min(i, rem), …): i*base <= n and
    // min(i, rem) <= k, so every intermediate stays within [lo, hi].
    def bound(i: Int): Long = lo + i * base + math.min(i.toLong, rem)
    (0 until k).map { i =>
      RangeInputPartition(bound(i), bound(i + 1)): InputPartition
    }.toArray
  }
}

final class RangeScan(
    lo: Long, hi: Long, slices: Int, out: StructType,
    maxRowsPerBatch: Option[Long] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = out
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeScan[$lo,$hi) cols=${out.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    RangeScan.slicePartitions(lo, hi, slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(out.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, slices, out, maxRowsPerBatch)
}

/** Streaming offset = the next unrevealed id (ids below it are
  * committed to the offset log).
  */
final case class RangeStreamOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

/** The streaming leg of the connector — the same interval revealed
  * incrementally as an exactly-once micro-batch source. Offsets are
  * plain ids: batch N covers [startOffset, endOffset) and replanning
  * any committed window yields the identical rows, which is the whole
  * exactly-once contract (the offset log + deterministic reveal make
  * restarts idempotent; the RangeStreamSpec restarts from a
  * checkpoint and extends the interval to pin it).
  *
  * Admission control: `maxRowsPerBatch` caps each batch, so a
  * Trigger.AvailableNow drain steps through ceil(n/rate) planned
  * batches instead of one table-sized batch — the knob that bounds
  * per-batch state at 100 TB. Filter pushdown and column pruning flow
  * in from the ScanBuilder exactly as in the batch leg: a selective
  * streaming query scans the narrowed interval only.
  */
final class RangeMicroBatchStream(
    lo: Long, hi: Long, slices: Int, out: StructType,
    maxRowsPerBatch: Option[Long])
    extends MicroBatchStream
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = RangeStreamOffset(lo)

  override def deserializeOffset(json: String): Offset =
    RangeStreamOffset(json.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used")

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RangeStreamOffset].next
    limit match {
      case r: ReadMaxRows =>
        RangeStreamOffset(math.min(hi, s + r.maxRows()))
      case _ => RangeStreamOffset(hi)
    }
  }

  override def reportLatestOffset(): Offset = RangeStreamOffset(hi)

  // the interval is static, so there is nothing to snapshot: the
  // AvailableNow wrapper reads reportLatestOffset() as its end goal
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] =
    RangeScan.slicePartitions(
      start.asInstanceOf[RangeStreamOffset].next,
      end.asInstanceOf[RangeStreamOffset].next,
      slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(out.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class RangeInputPartition(from: Long, until: Long)
    extends InputPartition

final class RangeReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangeInputPartition]
    new RangePartitionReader(rp.from, rp.until, cols)
  }
}

/** Materializes ONLY the pruned columns, in the pruned order. */
final class RangePartitionReader(from: Long, until: Long, cols: Array[String])
    extends PartitionReader[InternalRow] {

  private var cur = from - 1

  override def next(): Boolean = { cur += 1; cur < until }

  override def get(): InternalRow = {
    val vals = cols.map {
      case "id" => cur: java.lang.Long
      case "id_sq" => (cur * cur): java.lang.Long
      case "bucket" => (((cur % 16) + 16) % 16): java.lang.Long
      case "label" => UTF8String.fromString("b" + (((cur % 16) + 16) % 16))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = ()
}
