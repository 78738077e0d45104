package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Md5Prefix60

/** Session extensions for the graft engine — the Catalyst plug-in point
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `builder.withExtensions(new GraftExtensions)` as [[GraftSession]]
  * does). Currently injects the native [[Md5Prefix60]] content-hash
  * function; optimizer rules / strategies would register here the same
  * way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => graft.plans.RewriteMd5PrefixChain)
    extensions.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(
        classOf[Md5Prefix60].getName,
        null,
        "md5_prefix60",
        "md5_prefix60(str) - first 60 bits of md5(str) as a non-negative bigint",
        ""),
      (children: Seq[Expression]) => Md5Prefix60(children.head)))
  }
}
