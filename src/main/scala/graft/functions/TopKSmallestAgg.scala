package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the k smallest values per group — the
  * bounded-state alternative to sort-then-rank when only the extreme
  * tail is wanted: state is k longs per group on every path (partial,
  * shuffle, merge), never the group's row set.
  *
  * This is the (b) tier of the custom-function preference order
  * (native Expression > typed Aggregator > scala UDF): no codegen, but
  * algebraic partials that merge associatively, so map-side combine
  * still applies. Deterministic: multiset semantics, ties kept, output
  * sorted ascending.
  */
class TopKSmallestAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
