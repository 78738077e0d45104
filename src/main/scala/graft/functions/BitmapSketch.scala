package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Bitmap sketch ALGEBRA — the step past [[BitmapDistinct]] (which
  * folds a bitmap to its occupied count inside one aggregate):
  * [[BitmapSketchAgg]] emits the bitmap ITSELF as a binary column, and
  * the scalar popcount/AND/OR companions combine already-aggregated
  * sketches without re-touching rows.
  *
  * Why this matters at 100 TB: distinct-style questions across group
  * boundaries (audience overlap between event types, users seen on
  * both day X and day Y, reach of any channel union) are exact-distinct
  * joins over raw rows — a full reshuffle per question. Pre-aggregated
  * per-group bitmaps reduce EVERY such question to scalar ops over
  * m-bit values: intersection = popcount(a AND b), union by
  * inclusion-exclusion or popcount(a OR b). The corpus is scanned once;
  * the question matrix is answered from kilobytes.
  *
  * The occupied-bucket algebra is EXACT over buckets (hash mod m), so
  * results are deterministic and oracle-checkable; reading them as
  * cardinality estimates is linear counting, same as BitmapDistinct.
  */
case class BitmapSketchAgg(
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
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_agg"

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

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): BitmapSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapSketchAgg =
    copy(child = newChildren.head)
}

object BitmapSketchAgg {
  def fromArguments(args: Seq[Expression]): BitmapSketchAgg = {
    require(args.size == 2,
      s"graft_bitmap_agg takes (hash, numBuckets), got ${args.size} args")
    val m = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) =>
        // bounds-check BEFORE toInt — a Long literal like 4294967297
        // would otherwise truncate to a silently-valid small dimension
        // (the CountMin round-9-advice fix, applied here too)
        require(v > 0 && v <= (1 << 24),
          s"numBuckets must be in (0, 2^24], got $v")
        v.toInt
      case other => throw new IllegalArgumentException(
        s"numBuckets must be an integer literal, got $other")
    }
    BitmapSketchAgg(args.head, m)
  }
}

/** OR-merge AGGREGATE over already-materialized bitmap sketches — the
  * re-aggregation step the scalar pairwise ops can't express: roll N
  * per-group sketches (one per day/shard/partition) up into one union
  * sketch WITHOUT re-reading any raw rows. This is what makes the
  * bitmap family genuinely mergeable end-to-end: build per-day sketches
  * once, then any window/region/cohort union is an aggregate over
  * kilobyte binaries (the same algebra HLL gets from max-merge and KMV
  * from distinct-union take-k).
  *
  * All input sketches must share one width (byte length); mixed widths
  * are a caller error and fail fast. Zero rows yield an empty sketch
  * (popcount 0).
  */
case class BitmapOrAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_or_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch argument, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def orInto(acc: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) acc
    else if (acc.isEmpty) other.clone()
    else {
      require(acc.length == other.length,
        s"$prettyName: sketch width mismatch (${acc.length * 8} vs " +
          s"${other.length * 8} bytes) — all inputs must use one numBuckets")
      var i = 0
      while (i < acc.length) { acc(i) |= other(i); i += 1 }
      acc
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else orInto(buf, toLongs(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = orInto(a, b)

  override def eval(buf: Array[Long]): Any = serialize(buf)

  private def toLongs(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0,
      s"$prettyName: sketch length ${bytes.length} is not a whole number " +
        "of 64-bit words — not a graft_bitmap_agg sketch")
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = toLongs(bytes)

  override def withNewMutableAggBufferOffset(n: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapOrAgg =
    copy(child = newChildren.head)
}

/** popcount of a bitmap sketch — occupied-bucket count of an
  * already-materialized binary sketch. Codegen'd scalar.
  */
case class BitmapPopCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_popcount"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    BitmapSketchOps.popCount(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitmapSketchOps.popCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BitmapPopCount =
    copy(child = newChild)
}

/** popcount(a AND b) — exact occupied-bucket intersection of two
  * same-width sketches. Codegen'd scalar; never touches source rows.
  */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_and_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary sketch arguments, " +
        s"got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapSketchOps.andCount(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitmapSketchOps.andCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}

/** popcount(a OR b) — exact occupied-bucket union of two same-width
  * sketches.
  */
case class BitmapOrCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_or_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary sketch arguments, " +
        s"got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapSketchOps.orCount(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitmapSketchOps.orCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapOrCount =
    copy(left = newLeft, right = newRight)
}

/** Static helpers called from generated code. */
object BitmapSketchOps {

  def popCount(a: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < a.length) { v += java.lang.Integer.bitCount(a(i) & 0xff); i += 1 }
    v
  }

  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"sketch width mismatch: ${a.length} vs ${b.length} bytes")
    var v = 0L
    var i = 0
    while (i < a.length) { v += java.lang.Integer.bitCount(a(i) & b(i) & 0xff); i += 1 }
    v
  }

  def orCount(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"sketch width mismatch: ${a.length} vs ${b.length} bytes")
    var v = 0L
    var i = 0
    while (i < a.length) { v += java.lang.Integer.bitCount((a(i) | b(i)) & 0xff); i += 1 }
    v
  }
}
