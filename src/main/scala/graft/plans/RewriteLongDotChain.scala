package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.LongDotProduct

/** Optimizer rule: collapse the portable integer-dot-product chain
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)`
  * (what `graft.llm.Similarity.intDot` builds, valid on any session)
  * into the native codegen'd [[LongDotProduct]].
  *
  * Same plug-in contract as [[RewriteMd5PrefixChain]]: the library
  * emits the composed form, sessions running [[graft.GraftExtensions]]
  * get the native expression on every similarity/ANN plan — including
  * occurrences INSIDE other lambda bodies (the IVF centroid-argmax
  * fold), which `transformAllExpressions` reaches. The match is
  * deliberately exact — element-null, null-padding on length mismatch,
  * and empty→0 semantics are identical (LongDotProductSpec), any other
  * aggregate/zip_with shape is left untouched.
  */
object RewriteLongDotChain extends Rule[LogicalPlan] {

  /** `LambdaFunction` whose body is exactly `arg0 * arg1`. */
  private object MultiplyLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(
            Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        x.exprId == a.exprId && y.exprId == b.exprId
      case _ => false
    }
  }

  /** `LambdaFunction` whose body is exactly `acc + x`. */
  private object SumLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(
            Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  /** Identity finish lambda (what `functions.aggregate` emits when no
    * finish function is given).
    */
  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        v.exprId == a.exprId
      case _ => false
    }
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
            ZipWith(a, b, MultiplyLambda()),
            Literal(0L, LongType),
            SumLambda(),
            IdentityLambda())
          if isLongArray(a) && isLongArray(b) =>
        LongDotProduct(a, b)
    }
}
