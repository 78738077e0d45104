package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch: keep the k smallest
  * DISTINCT hash values per group. The third member of the distinct-
  * sketch family — bitmap (exact over buckets, m bits), HLL
  * (constant-size, log-log registers), KMV (k longs, and the only one
  * whose partials double as a uniform SAMPLE of the key space, which
  * is what makes theta-style set algebra possible downstream).
  *
  * Estimator (emitted by the caller, not here — it is one exact
  * integer division): with h_k the k-th smallest distinct hash over a
  * hash space of size M = 2^60, distinct ~ (k-1) * M div h_k; groups
  * with fewer than k distinct hashes carry their exact set (the
  * sketch IS the distinct set, estimate = size). Deterministic: no
  * RNG, the "sample" is the hash order itself.
  *
  * Merge = distinct-union then take k — associative and idempotent,
  * so per-shard sketches roll up under any partitioning. State is at
  * most k longs on every path.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 1, s"k must be at least 2 for the (k-1)/h_k estimator: $k")

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.contains(a)) b
    else if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
