package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Mergeable bitmap distinct sketch — a native
  * `TypedImperativeAggregate` (the Catalyst aggregate class whose
  * buffer is an arbitrary JVM object with explicit serialization —
  * the machinery behind the engine's own HLL++ / percentile
  * aggregates, and the remaining rung of the aggregate ladder next to
  * the declarative expressions and the typed `Aggregator` (q94)).
  *
  * Semantics: `graft_bitmap_distinct(hash, m)` marks bucket
  * `hash mod m` in an m-bit bitmap and returns the number of occupied
  * buckets — the V statistic of a linear-counting sketch (estimate
  * `-m·ln(1−V/m)`, see [[BitmapDistinct.linearCountEstimate]]). The
  * occupied count is EXACT and deterministic for a given hash column
  * (the gate oracle recomputes it as COUNT(DISTINCT bucket)), unlike
  * the estimate, which is the caller's lossy read of it.
  *
  * Why this shape at 100 TB: the buffer is a fixed m/8-byte bitmap
  * regardless of corpus size, partial aggregates merge by bitwise OR
  * (associative/commutative — map-side combine works), and serialized
  * buffers are what shuffle — m=4096 is 512 bytes per group per
  * partition, vs an exact distinct's per-value state. Pre-aggregated
  * per-day/per-shard sketches OR together for rollups without
  * re-touching rows — the property exact COUNT(DISTINCT) can never
  * have.
  */
case class BitmapDistinct(
    child: Expression,
    numBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBuckets > 0 && numBuckets <= (1 << 24),
    s"numBuckets must be in (0, 2^24], got $numBuckets")

  private val words = (numBuckets + 63) >>> 6

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash argument, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val b = (((h % numBuckets) + numBuckets) % numBuckets).toInt
      buf(b >>> 6) |= 1L << (b & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var v = 0L
    var i = 0
    while (i < words) { v += java.lang.Long.bitCount(buf(i)); i += 1 }
    v
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapDistinct =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren.head)
}

object BitmapDistinct {

  /** SQL-registration builder: second argument must be a foldable int
    * literal (the sketch width is plan-time state, not per-row data).
    */
  def fromArguments(args: Seq[Expression]): BitmapDistinct = {
    require(args.size == 2,
      s"graft_bitmap_distinct takes (hash, numBuckets), got ${args.size} args")
    val m = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"numBuckets must be an integer literal, got $other")
    }
    BitmapDistinct(args.head, m)
  }

  /** Linear-counting estimate from occupied buckets: `-m·ln(1−V/m)`;
    * saturates to m when the bitmap is full (V = m ⇒ estimate
    * diverges — the caller chose too small an m for the cardinality).
    */
  def linearCountEstimate(occupied: Long, m: Int): Double =
    if (occupied >= m) m.toDouble
    else -m.toDouble * math.log1p(-(occupied.toDouble / m))
}
