package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` classic Column factories, so
  * graft's native Catalyst expressions (e.g.
  * [[graft.functions.VariantTypeTag]]) can be used as `Column`s from
  * library code without requiring the session to carry
  * [[graft.GraftExtensions]] (the `call_function` route needs the
  * function registered per session; a DataFrame-API library shouldn't).
  *
  * The in-Spark-namespace shim is the standard connector pattern for
  * the one-class gap Spark 4 left when `Column.apply(Expression)` moved
  * behind `classic.ExpressionUtils`.
  */
object GraftExpressionBridge {

  /** Wrap a Catalyst expression as a classic Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a classic Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
