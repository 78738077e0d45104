package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the COPY text-format row codec: encode→decode is
  * the identity for arbitrary rows including nulls, empty strings, and
  * every character the escaper special-cases — the invariant the live
  * round-trip (PgLiveRoundTripSpec / q312) rides on for correctness of
  * values that never hit a "nice" code path.
  */
object PgCopyCodecPropertySpec extends Properties("PgCopyCodec") {

  private val gnarlyChar: Gen[Char] = Gen.frequency(
    6 -> Gen.asciiPrintableChar,
    2 -> Gen.oneOf('\\', '\t', '\n', '\r'),
    1 -> Gen.oneOf('\b', '\f', '\u000b', 'ü', '€', '語'),
    1 -> Gen.choose(1.toChar, 127.toChar))

  private val field: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(gnarlyChar).map(_.mkString),
    1 -> Gen.const(null),
    1 -> Gen.const(""),
    1 -> Gen.const("\\N")) // the literal two-char string, NOT null

  private val row: Gen[List[String]] = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, field))

  property("encode then decode is identity") = forAll(row) { r =>
    val decoded = PgWireClient.decodeCopyRow(PgWireClient.encodeCopyRow(r))
    decoded.toList == r
  }

  property("encoded form never contains a raw tab/newline inside a field") =
    forAll(row) { r =>
      val enc = PgWireClient.encodeCopyRow(r)
      // the only tabs are the N-1 delimiters; newlines never appear
      enc.count(_ == '\t') == r.size - 1 && !enc.contains('\n') &&
        !enc.contains('\r')
    }
}
