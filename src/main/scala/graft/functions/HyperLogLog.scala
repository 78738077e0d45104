package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Dense-register HyperLogLog over the native 60-bit content hash
  * ([[Md5Prefix60]]) — the constant-size mergeable distinct sketch
  * (Flajolet et al. 2007), sized m registers = m bytes per group.
  *
  * Register split of the 60-bit hash: index = h mod m (low p bits,
  * m = 2^p), remainder w = h div m (B = 60 - p bits), rho(w) =
  * leading-zero count of w within B bits + 1 (w = 0 -> B + 1).
  * Merge = register-wise max — associative, commutative, idempotent,
  * so partials combine under ANY partitioning and re-aggregation
  * (per-shard sketches roll up to corpus sketches without re-reading
  * rows — the point at 100 TB).
  *
  * DETERMINISM CONTRACT: the emitted estimate is computed in exact
  * integer arithmetic, never a double fold. With S = sum_j 2^(B - M_j)
  * scaled by 2^p to the integer S' = sum_j 2^(60 - M_j)  (M_j = 0 for
  * empty registers), the raw HLL estimate
  *   E = alpha_m * m^2 / S,  alpha_m = 0.7213 / (1 + 1.079/m)
  * rewrites rationally to  E = 7213 * m^3 * 2^60 / (10 * (1000m + 1079) * S')
  * and is emitted as the floor of that integer division (BigInt here,
  * HUGEINT in the oracle — bit-identical). Output struct:
  * (v = empty registers, s_scaled = S' as DECIMAL(38,0), est = E).
  * The small-range regime is left to the reader via v (linear counting
  * m*ln(m/v) is transcendental, deliberately not folded in here).
  */
case class HyperLogLogAgg(
    child: Expression,
    numRegisters: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(numRegisters >= 16 && numRegisters <= (1 << 16) &&
    Integer.bitCount(numRegisters) == 1,
    s"numRegisters must be a power of two in [16, 65536], got $numRegisters")

  private val p = Integer.numberOfTrailingZeros(numRegisters)
  private val bitsB = 60 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("s_scaled", DecimalType(38, 0), nullable = false),
    StructField("est", LongType, nullable = false)))
  override def prettyName: String = "graft_hll"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash argument, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](numRegisters)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0, s"$prettyName expects a non-negative 60-bit hash, got $h")
      val reg = (h & (numRegisters - 1)).toInt
      val w = h >>> p
      val rho = (if (w == 0L) bitsB + 1 else bitsB - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1).toByte
      if (rho > buf(reg)) buf(reg) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < numRegisters) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var v = 0L
    var sScaled = BigInt(0)
    var i = 0
    while (i < numRegisters) {
      val mj = buf(i).toInt
      if (mj == 0) v += 1
      sScaled += BigInt(1) << (60 - mj)
      i += 1
    }
    val m = BigInt(numRegisters)
    val est = (BigInt(7213) * m * m * m * (BigInt(1) << 60)) /
      (BigInt(10) * (BigInt(1000) * m + 1079) * sScaled)
    new GenericInternalRow(Array[Any](
      v, org.apache.spark.sql.types.Decimal(BigDecimal(sScaled), 38, 0),
      est.toLong))
  }

  // clone both ways: the buffer is mutated in place by update/merge, so
  // it must never alias bytes Spark may still hold a reference to
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperLogLogAgg =
    copy(child = newChildren.head)
}

object HyperLogLogAgg {
  def fromArguments(args: Seq[Expression]): HyperLogLogAgg = {
    require(args.size == 2,
      s"graft_hll takes (hash, numRegisters), got ${args.size} args")
    val m = args(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"numRegisters must be an integer literal, got $other")
    }
    HyperLogLogAgg(args.head, m)
  }
}
