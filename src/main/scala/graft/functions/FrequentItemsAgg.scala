package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al., ICDT'05) frequent-items summary as a
  * native `TypedImperativeAggregate` — the bounded-memory heavy-hitters
  * operator: at most `capacity` counters per aggregation state, no
  * matter how many distinct items stream past.
  *
  * Guarantees (the classic ones, preserved across the distributed
  * merge): every item with true count > N/capacity is present in the
  * summary, and each entry's true count lies in [cnt − err, cnt].
  * When the observed distinct count never exceeds `capacity`, no
  * eviction happens, `err` is 0, and counts are EXACT and
  * deterministic — the regime the oracle gate runs in (corpus
  * vocabulary < capacity); the approximate regime's bounds are pinned
  * by `FrequentItemsSpec`.
  *
  * Merge (partial summaries, map-side combine, shuffle of ≤ capacity
  * entries per group per partition): shared items add counts and
  * errors; an item absent from a FULL other side may have been evicted
  * there, so it absorbs that side's minimum count into both cnt and
  * err (Berinde et al.'s bound-preserving combine); then prune back to
  * the top `capacity` by (cnt desc, item asc) — a deterministic total
  * order, so identical inputs give identical summaries regardless of
  * partitioning in the exact regime.
  *
  * Output: the summary as `array<struct<item,cnt,err>>` already sorted
  * by (cnt desc, item asc) — callers posexplode and cut at their k.
  */
case class FrequentItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(capacity > 0 && capacity <= (1 << 20),
    s"capacity must be in (0, 2^20], got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_frequent"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item argument, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + 1, e))
        case None if buf.size < capacity => buf.update(item, (1L, 0L))
        case None =>
          // evict the minimum-count entry (ties: lexicographically
          // greatest item goes, keeping the order deterministic) and
          // inherit its count as the new entry's overestimate
          val (minItem, (minCnt, _)) = buf.minBy {
            case (i, (c, _)) => (c, i)
          }(Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          buf.remove(minItem)
          buf.update(item, (minCnt + 1, minCnt))
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    val minA = if (a.size >= capacity) a.valuesIterator.map(_._1).min else 0L
    val minB = if (b.size >= capacity) b.valuesIterator.map(_._1).min else 0L
    val out = mutable.HashMap.empty[String, (Long, Long)]
    a.foreach { case (i, (c, e)) =>
      b.get(i) match {
        case Some((cb, eb)) => out.update(i, (c + cb, e + eb))
        case None => out.update(i, (c + minB, e + minB))
      }
    }
    b.foreach { case (i, (c, e)) =>
      if (!a.contains(i)) out.update(i, (c + minA, e + minA))
    }
    if (out.size <= capacity) out
    else {
      val kept = out.toSeq
        .sortBy { case (i, (c, _)) => (-c, i) }
        .take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any =
    new GenericArrayData(buf.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val items = buf.toSeq.map { case (i, ce) =>
      (i.getBytes(StandardCharsets.UTF_8), ce)
    }
    val size = 4 + items.map { case (b, _) => 4 + b.length + 16 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.size)
    items.foreach { case (b, (c, e)) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out.update(new String(b, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItemsAgg =
    copy(child = newChildren.head)
}

object FrequentItemsAgg {
  def fromArguments(args: Seq[Expression]): FrequentItemsAgg = {
    require(args.size == 2,
      s"graft_frequent takes (item, capacity), got ${args.size} args")
    val cap = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"capacity must be an integer literal, got $other")
    }
    FrequentItemsAgg(args.head, cap)
  }
}
