package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.Md5Prefix60

/** Optimizer rule: collapse the engine-portable content-hash chain
  * `cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)`
  * (what `graft.llm.TextHash.hash60` builds, portable to any session)
  * into the native [[Md5Prefix60]] expression — one codegen'd call, no
  * hex string, no base-conversion parse.
  *
  * The library emits the portable chain so its plans stay valid
  * everywhere; sessions with [[graft.GraftExtensions]] installed get
  * this rewrite for free on every dedup/fingerprint query. Semantics
  * are identical (asserted in `RewriteMd5PrefixChainSpec` and by the
  * DuckDB oracle gate, which runs under the extension). The match is
  * deliberately exact — any other md5/conv shape is left untouched.
  */
object RewriteMd5PrefixChain extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  /** The analyzer wraps Md5's string argument in an implicit
    * string→binary cast; unwrap it so the native expression sees the
    * original string child.
    */
  private object Md5StringChild {
    def unapply(e: Expression): Option[Expression] = e match {
      case Md5(Cast(inner, org.apache.spark.sql.types.BinaryType, _, _))
          if inner.dataType == org.apache.spark.sql.types.StringType => Some(inner)
      case Md5(inner) if inner.dataType == org.apache.spark.sql.types.StringType =>
        Some(inner)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.LITERAL)) {
      case cast @ Cast(
            Conv(Substring(Md5StringChild(child), IntLit(1), IntLit(15)),
              IntLit(16), IntLit(10), _),
            LongType, _, _) =>
        val replaced = Md5Prefix60(child)
        if (cast.dataType == replaced.dataType) replaced else cast
    }
}
