package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact integer dot product of two
  * `array<bigint>` columns — the primitive under every similarity
  * operator (`graft.llm.Similarity.intDot`: quantized-embedding
  * norms, brute-force/LSH/IVF cosine, hyperplane sign bits).
  *
  * Semantically identical to the portable
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)`
  * chain (asserted by `LongDotProductSpec`): a null input array, a null
  * element, or a length mismatch (zip_with null-pads the short side)
  * all yield NULL; empty arrays yield 0. But the composed form is a
  * nested higher-order function — CodegenFallback, one interpreted
  * lambda invocation per element (~µs each), and it allocates the
  * zipped intermediate array. On the ANN hot path that is
  * rows × centroids × dims invocations; this expression is ONE
  * codegen'd call running a primitive fused multiply-add loop
  * (measured ~50× on the IVF assignment projection at sf0.1).
  *
  * Registered as SQL function `long_dot` via [[graft.GraftExtensions]];
  * library combinators keep emitting the portable chain and
  * [[graft.plans.RewriteLongDotChain]] collapses it on sessions with
  * the extension installed.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // Null even for non-null inputs (null element / length mismatch).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.LongDotProduct.dot($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_dot"
}

object LongDotProduct {

  /** Boxed so generated code gets the three-way result (null / value)
    * in one call; called per row from both codegen and interpreted
    * paths — keep it static and allocation-free beyond the box.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
