package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
  * mergeable FREQUENCY summary: depth x width counters; item count
  * estimated as the minimum over its depth cells, always an
  * overestimate with error <= N/width at ~1 - 2^-depth confidence.
  * The complement of [[FrequentItemsAgg]] (which keeps top items;
  * this answers point queries for ANY item after the fact).
  *
  * Composability contract: the aggregate does NOT hash internally —
  * it takes a precomputed ARRAY of per-row bucket indices (one per
  * depth), e.g. `transform(sequence(0, d-1), i ->
  * md5_prefix60(concat(i, '|', item)) % width)`. That keeps the hash
  * family an explicit, SQL-replicable part of the query (the oracle
  * recomputes the identical cells), and lets callers weight rows by
  * updating with the same bucket array multiple times upstream.
  *
  * Merge = cell-wise sum — partials combine under any partitioning;
  * per-shard sketches add into corpus sketches without re-reading
  * rows. State = depth*width longs regardless of corpus size.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= 16, s"depth must be in (0, 16], got $depth")
  require(width > 0 && width <= (1 << 20),
    s"width must be in (0, 2^20], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> bucket indices, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"$prettyName expects $depth bucket indices, got ${arr.numElements()}")
      var d = 0
      while (d < depth) {
        val b = arr.getLong(d)
        require(b >= 0 && b < width,
          s"bucket index $b out of range [0, $width) at depth $d")
        buf(d * width + b.toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.length * 8)
    bb.putInt(depth).putInt(width)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    require(d == depth && w == width,
      s"sketch shape mismatch: got ${d}x$w, expected ${depth}x$width")
    Array.fill(d * w)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  def fromArguments(args: Seq[Expression]): CountMinAgg = {
    require(args.size == 3,
      s"graft_cms_agg takes (buckets, depth, width), got ${args.size} args")
    def lit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      // Bounds-check BEFORE narrowing: 4294967300L.toInt is 4, which
      // would sail past the dimension requires with a silently wrong
      // sketch shape (round-9 advice).
      case Literal(v: Long, LongType) =>
        require(v >= Int.MinValue && v <= Int.MaxValue,
          s"$name must fit in a 32-bit integer, got $v")
        v.toInt
      case other => throw new IllegalArgumentException(
        s"$name must be an integer literal, got $other")
    }
    CountMinAgg(args.head, lit(args(1), "depth"), lit(args(2), "width"))
  }
}

/** Point query against a materialized Count-Min sketch: min over the
  * item's depth cells. Codegen'd scalar over the binary sketch — the
  * question matrix is answered from kilobytes, never from rows.
  */
case class CountMinQuery(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_query"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, array<bigint> buckets), got $other")
    }

  override protected def nullSafeEval(sketch: Any, buckets: Any): Any =
    CountMinOps.query(sketch.asInstanceOf[Array[Byte]],
      buckets.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, b) => s"graft.functions.CountMinOps.query($s, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinQuery =
    copy(left = newLeft, right = newRight)
}

/** Static helper called from generated code. */
object CountMinOps {
  def query(sketch: Array[Byte], buckets: ArrayData): Long = {
    val bb = ByteBuffer.wrap(sketch)
    val depth = bb.getInt; val width = bb.getInt
    require(buckets.numElements() == depth,
      s"expected $depth bucket indices, got ${buckets.numElements()}")
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val b = buckets.getLong(d)
      require(b >= 0 && b < width,
        s"bucket index $b out of range [0, $width) at depth $d")
      val c = bb.getLong(8 + (d * width + b.toInt) * 8)
      if (c < best) best = c
      d += 1
    }
    best
  }
}
