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

  /** Conservative per-pattern quick-reject (r20, guide §1.2 step 2 —
    * the pre-classifier in front of the parse dispatch). Two checks
    * derived from the java.time pattern, both PROVABLY safe (they
    * accept a superset of what the formatter accepts, so skipped
    * attempts are exactly the ones that would have failed):
    *
    *  1. every literal character the pattern must consume (quoted
    *     sections and unquoted punctuation) has to occur in the input
    *     — a parse that must consume 'T' cannot succeed on a string
    *     with no 'T';
    *  2. every ASCII character of the input must be consumable by SOME
    *     pattern element — digits/sign for numeric fields, the
    *     literal characters, Z/sign/colon/digits for offset fields. A
    *     date-only pattern whose alphabet is {digits, '-', '+'} can
    *     never parse a string containing 'T' or ':'.
    *
    * Check 2 is disabled when the pattern carries a text field ('a' —
    * locale-dependent alphabet) or an unrecognized field letter;
    * check 1 is field-independent and always on. Chars ≥ 128 are
    * always allowed (conservative). Net effect on the reference's
    * 10-format chain: a mismatched format rejects in one O(n) scan
    * instead of a near-full java.time parse, so each value pays ONE
    * real parse — the format that matches — plus cheap scans
    * (equivalence with the try_to_timestamp chain is differentially
    * pinned in VariantExprsSpec across valid/invalid/ambiguous/
    * whitespace/5-digit-year inputs).
    */
  private final class QuickReject(
      val required: Array[Char], val allowed: Array[Boolean], val checkAllowed: Boolean)

  @transient private lazy val rejects: Array[QuickReject] =
    patterns.map { p =>
      val numeric = "yMdHhmsSD"
      val req = scala.collection.mutable.LinkedHashSet.empty[Char]
      val allowed = new Array[Boolean](128)
      var checkAllowed = true
      def allow(c: Char): Unit = if (c < 128) allowed(c) = true
      def allowDigitsAndSign(): Unit = {
        var c = '0'; while (c <= '9') { allowed(c) = true; c = (c + 1).toChar }
        allowed('+') = true; allowed('-') = true
      }
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        if (c == '\'') {
          if (i + 1 < p.length && p.charAt(i + 1) == '\'') {
            req += '\''; allow('\''); i += 2
          } else {
            i += 1
            while (i < p.length && p.charAt(i) != '\'') {
              req += p.charAt(i); allow(p.charAt(i)); i += 1
            }
            i += 1
          }
        } else if (c.isLetter) {
          if (numeric.indexOf(c.toInt) >= 0) allowDigitsAndSign()
          else if (c == 'X' || c == 'x') {
            allow('Z'); allow(':'); allowDigitsAndSign()
          } else checkAllowed = false // text/unknown field: alphabet unknown
          i += 1
        } else { req += c; allow(c); i += 1 }
      }
      new QuickReject(req.toArray, allowed, checkAllowed)
    }.toArray

  private def mightMatch(s: String, qr: QuickReject): Boolean = {
    if (qr.checkAllowed) {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < 128 && !qr.allowed(c)) return false
        i += 1
      }
    }
    var j = 0
    while (j < qr.required.length) {
      if (s.indexOf(qr.required(j).toInt) < 0) return false
      j += 1
    }
    true
  }

  /** Called from generated code. */
  def parse(input: UTF8String): InternalRow = {
    val s = input.toString
    val qrs = rejects
    var i = 0
    while (i < formatters.length) {
      if (mightMatch(s, qrs(i))) {
        val parsed = formatters(i).parseOptional(s)
        if (parsed.isDefined) return InternalRow(parsed.get, i)
      }
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
