package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, EqualTo, Expression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** The LOGICAL half of the native as-of join — the full Catalyst
  * custom-operator ladder, which the repo's other extensions
  * (expressions + optimizer rules) stop short of:
  *
  *   marker function  → [[GraftAsOfMarker]] (user-facing seam: an
  *                      ordinary boolean "condition" inside a plain
  *                      `left.join(right, …)` call)
  *   resolution rule  → [[RewriteAsOfMarkerJoin]] (replaces the marked
  *                      Join with the dedicated node at analysis time)
  *   logical node     → [[GraftAsOfJoin]]
  *   planner strategy → `AsOfJoinStrategy` (plans the physical
  *                      single-pass merge, `GraftAsOfJoinExec`)
  *
  * all registered through `SparkSessionExtensions` in
  * `GraftExtensions` — no Spark internals are forked, and a session
  * without the extension simply fails analysis on the unevaluable
  * marker instead of silently computing something else.
  *
  * Spark itself has a logical `AsOfJoin` (used by the pandas API) but
  * lowers it via `RewriteAsOfJoin` into an aggregate-based plan; the
  * graft library's portable formulation is the union+window
  * (`analytics/AsOfJoin.scala`). This native path exists to pin the
  * third, strongest plan: co-partition both sides, sort each, and
  * MERGE in one pass with O(1) state per key — no union blow-up, no
  * window machinery, each side shuffled separately and only once.
  */

/** Boolean marker expression carried inside a join condition:
  * `graft_asof_marker(leftTs, rightTs, rightId)` asserts "attach the
  * right row with the greatest `rightTs <= leftTs`, ties on the
  * greatest `rightId`". Never evaluated — [[RewriteAsOfMarkerJoin]]
  * must consume it during analysis; reaching execution unrewritten is
  * an explicit analysis error, not a silent wrong answer.
  */
case class GraftAsOfMarker(leftTs: Expression, rightTs: Expression,
    rightId: Expression, tolerance: Expression) extends Expression
    with Unevaluable {
  override def children: Seq[Expression] =
    Seq(leftTs, rightTs, rightId, tolerance)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(leftTs = newChildren(0), rightTs = newChildren(1),
      rightId = newChildren(2), tolerance = newChildren(3))
}

/** Backward as-of join: output = every left row ++ the matched right
  * row's columns (null-extended when no right row of the same key has
  * `rightTs <= leftTs`). Semantics identical to
  * `analytics/AsOfJoin.asOf` — latest `rightTs` wins, ties broken by
  * the greatest `rightId` — so the two implementations gate each
  * other. Timestamps and the tie-break id are required to be BIGINT
  * (the library-wide epoch-micros convention), enforced at rewrite.
  */
case class GraftAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightId: Expression,
    toleranceUs: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Analysis-time rewrite: an Inner join whose condition is a
  * conjunction of equi-key predicates plus exactly one
  * [[GraftAsOfMarker]] becomes a [[GraftAsOfJoin]]. Any malformed use
  * of the marker (wrong join type, non-equi conjuncts, sides crossed,
  * non-BIGINT time/id) fails analysis with a targeted message.
  */
object RewriteAsOfMarkerJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> s"graft_asof_marker: $msg"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j @ Join(l, r, joinType, Some(cond), _)
          if j.resolved && cond.exists(_.isInstanceOf[GraftAsOfMarker]) =>
        if (joinType != Inner)
          fail(s"only INNER join syntax is supported (got $joinType); " +
            "the as-of attach itself is left-outer by definition")
        val (markers, rest) =
          conjuncts(cond).partition(_.isInstanceOf[GraftAsOfMarker])
        if (markers.size != 1)
          fail(s"exactly one marker per join, got ${markers.size}")
        val m = markers.head.asInstanceOf[GraftAsOfMarker]
        val lOut = AttributeSet(l.output)
        val rOut = AttributeSet(r.output)
        def sideOf(e: Expression): Char =
          if (e.references.subsetOf(lOut)) 'L'
          else if (e.references.subsetOf(rOut)) 'R'
          else fail(s"expression $e mixes columns of both sides")
        val keys = rest.map {
          case EqualTo(a, b) => (sideOf(a), sideOf(b)) match {
            case ('L', 'R') => (a, b)
            case ('R', 'L') => (b, a)
            case _ => fail(s"key equality $a = $b must pair one column " +
              "from each side")
          }
          case other => fail(s"non-equi conjunct $other alongside the " +
            "marker; only key equalities are supported")
        }
        if (keys.isEmpty) fail("at least one equi-key is required")
        if (sideOf(m.leftTs) != 'L' || sideOf(m.rightTs) != 'R' ||
          sideOf(m.rightId) != 'R')
          fail("marker arguments must be (left ts, right ts, right id)")
        for (e <- Seq(m.leftTs, m.rightTs, m.rightId))
          if (e.dataType != LongType)
            fail(s"$e must be BIGINT (epoch micros / id), got ${e.dataType}")
        val tol = m.tolerance match {
          case e if !e.foldable =>
            fail(s"tolerance must be a literal, got $e")
          case e => Option(e.eval(null)) map {
            case t: Long if t >= 0 => t
            case t: Long => fail(s"tolerance must be >= 0, got $t")
            case other => fail(s"tolerance must be BIGINT µs, got $other " +
              s"of ${m.tolerance.dataType}")
          }
        }
        GraftAsOfJoin(l, r, keys.map(_._1), keys.map(_._2),
          m.leftTs, m.rightTs, m.rightId, tol)
    }
}
