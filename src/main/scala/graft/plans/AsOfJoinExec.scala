package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSeq, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Plans [[GraftAsOfJoin]] → [[GraftAsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: GraftAsOfJoin =>
      GraftAsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightId, p.toleranceUs, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Single-pass sort-merge as-of join.
  *
  * Physical contract: both children hash-clustered on their keys
  * (`ClusteredDistribution` — the same requirement SortMergeJoinExec
  * declares, so EnsureRequirements co-partitions them and AQE
  * coalesces the two exchanges like any shuffle join's; note AQE's
  * skew-join SPLIT rewrites only the built-in SMJ/SHJ nodes, so a
  * pathologically hot key here needs the library's salting pattern,
  * not AQE), left sorted by (keys, ts), right by (keys, ts, id). Each partition is then ONE
  * forward merge: the right cursor never rewinds (left ts is
  * nondecreasing within a key), and the only retained state is the
  * single best-so-far right row for the current key — O(1), against
  * the union+window plan's running window state over the unioned
  * relation and the per-key cross product of the naive theta join.
  *
  * Null semantics (SQL-strict): a null in a left key or ts → no match
  * (row still emitted, null-extended); right rows with null key or ts
  * can never match and are skipped. Ascending nulls-first sorting puts
  * all such rows ahead of real candidates, so the skips are cursor
  * advances, not scans.
  *
  * No codegen (`doExecute` only): the operator sits between two
  * exchanges at a whole-stage boundary anyway, and the merge is a
  * tight object loop with two reused projections per side.
  */
case class GraftAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightId: Expression,
    toleranceUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(rightId, Ascending)))

  /** Left rows pass through in their sorted order, so downstream sorts
    * on (keys, ts) are eliminated.
    */
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of left rows with a match"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GraftAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsBound = BindReferences.bindReference(lTs, AttributeSeq(lOut))
      val rTsBound = BindReferences.bindReference(rTs, AttributeSeq(rOut))
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // bind against the NULL-PADDED schema (right side forced
      // nullable): binding to rOut as-is would let a non-nullable
      // right column elide its null check and read 0 from the
      // null-extension row instead of null
      val resultProj =
        UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // best right row seen for `curKey` (a defensive copy — the
        // child iterator reuses its row object) and its ts; a match
        // that later falls out of tolerance needs no replacement
        // scan — any earlier right row is older still
        private var curKey: InternalRow = null
        private var lastMatch: InternalRow = null
        private var lastMatchTs: Long = Long.MinValue

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyProj(l)
          val ltAny = lTsBound.eval(l)
          var matched: InternalRow = null
          if (!k.anyNull && ltAny != null) {
            val lt = ltAny.asInstanceOf[Long]
            if (curKey == null || keyOrd.compare(curKey, k) != 0) {
              curKey = k.copy()
              lastMatch = null
            }
            // drop right rows that can never match: null keys sort
            // first, then keys strictly below the current left key
            var advance = true
            while (advance && rBuf.hasNext) {
              val rk = rKeyProj(rBuf.head)
              advance = rk.anyNull || keyOrd.compare(rk, k) < 0
              if (advance) rBuf.next()
            }
            // consume same-key rows whose ts qualifies; sorted by
            // (ts, id) so the LAST one consumed is the as-of winner
            var take = true
            while (take && rBuf.hasNext) {
              val head = rBuf.head
              if (keyOrd.compare(rKeyProj(head), k) != 0) take = false
              else {
                val rtAny = rTsBound.eval(head)
                if (rtAny == null) rBuf.next() // unmatchable, skip
                else if (rtAny.asInstanceOf[Long] <= lt) {
                  lastMatchTs = rtAny.asInstanceOf[Long]
                  lastMatch = rBuf.next().copy()
                } else take = false
              }
            }
            matched =
              if (lastMatch != null && tol.exists(t => lt - lastMatchTs > t))
                null
              else lastMatch
          }
          numOutputRows += 1
          if (matched != null) {
            numMatched += 1
            resultProj(joined(l, matched))
          } else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}
