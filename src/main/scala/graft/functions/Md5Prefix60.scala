package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable content hash used
  * by the dedup/similarity operators (`graft.llm.TextHash.hash60`): the
  * first 15 hex chars of md5 as a non-negative 60-bit long.
  *
  * Semantically identical to the composed
  * `conv(substr(md5(x),1,15),16,10).cast(long)` chain (asserted by
  * `Md5Prefix60Spec`), but evaluated as ONE codegen'd call on the raw
  * UTF8 bytes — no hex-string materialization, no base-conversion
  * string parse, no intermediate allocations — which matters on the
  * shingle-hash hot path where it runs per n-gram per document.
  *
  * Registered as SQL function `md5_prefix60` via
  * [[graft.GraftExtensions]] (SparkSessionExtensions → FunctionRegistry
  * injection). Library combinators keep the composed chain as the
  * default so their plans stay valid on sessions without the extension;
  * sessions built through [[graft.GraftSession]] get the native
  * function.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60 {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 (15 hex chars = 7.5 bytes: 7 full bytes plus
    * the high nibble of byte 8), matching
    * `conv(substr(md5(x),1,15),16,10)` exactly. Called from generated
    * code — keep it static, allocation-free beyond the digest.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }
}
