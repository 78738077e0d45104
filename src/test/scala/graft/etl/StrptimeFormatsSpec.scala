package graft.etl

import java.time.format.DateTimeFormatter
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class StrptimeFormatsSpec extends AnyFunSuite {

  test("all 10 reference formats translate") {
    val expected = Map(
      "%Y-%m-%d" -> "y-M-d",
      "%m/%d/%Y" -> "M/d/y",
      "%d-%m-%Y" -> "d-M-y",
      "%Y/%m/%d" -> "y/M/d",
      "%Y.%m.%d" -> "y.M.d",
      "%Y-%m-%dT%H:%M:%S" -> "y-M-d'T'H:m:s",
      "%Y-%m-%dT%H:%M:%S%z" -> "y-M-d'T'H:m:sXX",
      "%Y-%m-%dT%H:%M:%S.%fZ" -> "y-M-d'T'H:m:s.SSSSSS'Z'",
      "%d-%m-%Y %H:%M:%S" -> "d-M-y H:m:s",
      "%m/%d/%Y %I:%M %p" -> "M/d/y h:m a")
    for ((strp, java) <- expected)
      assert(StrptimeFormats.toParsePattern(strp) == java, s"for $strp")
  }

  test("format patterns are zero-padded") {
    assert(StrptimeFormats.toFormatPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(StrptimeFormats.toFormatPattern("%Y-%m-%dT%H:%M:%S%z") == "yyyy-MM-dd'T'HH:mm:ssXX")
  }

  test("parse patterns accept unpadded components like strptime") {
    val f = DateTimeFormatter.ofPattern(StrptimeFormats.toParsePattern("%m/%d/%Y"))
    assert(LocalDate.parse("3/4/2025", f) == LocalDate.of(2025, 3, 4))
    assert(LocalDate.parse("03/04/2025", f) == LocalDate.of(2025, 3, 4))
  }

  test("unknown directive and dangling percent are rejected") {
    assertThrows[ConfigError](StrptimeFormats.toParsePattern("%Q"))
    assertThrows[ConfigError](StrptimeFormats.toParsePattern("abc%"))
  }

  test("escaped percent and literal letters") {
    assert(StrptimeFormats.toParsePattern("%%d") == "'%d'")
    assert(StrptimeFormats.hasOffsetDirective("%Y-%m-%dT%H:%M:%S%z"))
    assert(!StrptimeFormats.hasOffsetDirective("%Y-%m-%d"))
  }
}
