package graft.functions

import java.time.ZoneId

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{LegacyDateFormats, TimestampFormatter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native first-match multi-format timestamp parse (the ETL transform's
  * T4 semantic, reference `transformer.py:82-111`): try each configured
  * pattern in declared order, stop at the first that parses, return
  * `struct(ts timestamp, idx int)` — the parsed instant and the INDEX
  * of the matching pattern (both NULL when nothing matches).
  *
  * Why not `coalesce(try_to_timestamp × N)`: that chain (used through
  * round 12) pays a thrown-and-caught `DateTimeParseException` per
  * non-matching format per row — ~5 exception constructions per
  * document on the q309 throughput gate — and re-renders the input
  * string per attempt; any consumer that also needs WHICH format
  * matched (the `%z` offset rendering) re-evaluates the whole chain.
  * This expression runs the same Spark `TimestampFormatter`s that
  * `try_to_timestamp` uses (same pattern dialect, same strict
  * resolver), but through `parseOptional` — the exception-free parse
  * path Spark added for try-casts — and surfaces the match index so
  * downstream logic is a cheap struct-field read.
  *
  * Scale shape: map-only, codegen'd via one instance-method call;
  * formatters are built lazily per executor (`@transient`).
  */
case class MultiFormatTimestamp(
    child: Expression,
    patterns: Seq[String],
    timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("ts", TimestampType, nullable = true),
    StructField("idx", IntegerType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    // isInstanceOf, not ==: Spark 4 string types carry a collation and
    // any of them evaluates to the UTF8String this expression reads
    if (child.dataType.isInstanceOf[StringType] && patterns.nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and at least one pattern")

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  @transient private lazy val formatters: Array[TimestampFormatter] = {
    val zone: ZoneId = zoneId
    patterns.map(p =>
      TimestampFormatter(
        p, zone, LegacyDateFormats.SIMPLE_DATE_FORMAT, isParsing = true)).toArray
  }

  /** Called from generated code. */
  def parse(input: UTF8String): InternalRow = {
    val s = input.toString
    var i = 0
    while (i < formatters.length) {
      val parsed = formatters(i).parseOptional(s)
      if (parsed.isDefined) return InternalRow(parsed.get, i)
      i += 1
    }
    InternalRow(null, null)
  }

  override protected def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mft", this, classOf[MultiFormatTimestamp].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.parse($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiFormatTimestamp =
    copy(child = newChild)

  override def prettyName: String = "graft_multi_format_timestamp"
}
