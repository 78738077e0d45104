package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks._

import graft.SparkTestSession

class DamerauSpec extends AnyFunSuite with SparkTestSession {

  test("reference distances, including the OSA-vs-unrestricted distinguisher") {
    val cases = Table(
      ("a", "b", "d"),
      ("", "", 0L),
      ("a", "", 1L),
      ("", "abc", 3L),
      ("abc", "abc", 0L),
      ("kitten", "sitting", 3L),
      ("teh", "the", 1L),      // adjacent transposition = 1 (lev says 2)
      ("apple", "aplpe", 1L),
      ("ab", "ba", 1L),
      ("ca", "abc", 2L),       // UNRESTRICTED: 3 under OSA, 2 under true DL
      ("abcdef", "abcfad", 3L))
    forAll(cases) { (a, b, d) =>
      assert(DamerauOps.distance(a, b) === d, s"distance($a, $b)")
      assert(DamerauOps.distance(b, a) === d, s"symmetry($b, $a)")
    }
  }

  test("never exceeds levenshtein, and triangle-bounded by length delta") {
    val words = Seq("word", "wodr", "sword", "ward", "wordy", "drow", "")
    for (a <- words; b <- words) {
      val dl = DamerauOps.distance(a, b)
      assert(dl >= math.abs(a.length - b.length))
      assert(dl <= math.max(a.length, b.length))
    }
  }

  test("SQL surface evaluates inside codegen with null propagation") {
    val rows = spark.sql(
      """SELECT graft_damerau('teh', 'the') AS d1,
                graft_damerau('ca', 'abc') AS d2,
                graft_damerau(CAST(NULL AS STRING), 'x') AS d3""").head()
    assert(rows.getLong(0) === 1L)
    assert(rows.getLong(1) === 2L)
    assert(rows.isNullAt(2))
  }

  test("rejects non-string arguments") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_damerau(1, 'x')").collect()
    }
    assert(e.getMessage.contains("string"))
  }
}
