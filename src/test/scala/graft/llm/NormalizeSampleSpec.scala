package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class NormalizeSampleSpec extends AnyFunSuite with SparkTestSession {

  private def one(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.normalize(col("t"))).head().getString(0)
  }

  test("normalize lowercases, strips control chars, squeezes punctuation, collapses space") {
    assert(one("  Hello\t\tWORLD!!!  ") == "hello world!")
    assert(one("a\u0000b\u001fc") == "a b c")
    assert(one("Wait... what?? now,, ok") == "wait. what? now, ok")
    assert(one("already clean") == "already clean")
  }

  test("normalize is idempotent") {
    val dirty = Seq("  A..B  ", "x\n\ny!!", "MiXeD   CaSe. ")
    dirty.foreach(s => assert(one(one(s)) == one(s)))
  }

  test("stratifiedAccept keeps ~fraction per stratum, deterministically, dropping unlisted") {
    import spark.implicits._
    val d = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", s"text $i"))
      .toDF("id", "s", "t")
    val accept = Curation.stratifiedAccept(col("s"), col("t"), Seq("a" -> 0.3))
    val kept = d.filter(accept)
    val byStratum = kept.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byStratum.contains("b")) // unlisted stratum dropped entirely
    val rate = byStratum("a").toDouble / 1000
    assert(rate > 0.2 && rate < 0.4, s"rate $rate")
    // decision is a pure function of (stratum, key): re-run identical
    assert(d.filter(accept).count() == kept.count())
    // full fraction keeps everything, zero keeps nothing
    assert(d.filter(Curation.stratifiedAccept(col("s"), col("t"),
      Seq("a" -> 1.0, "b" -> 1.0))).count() == 2000)
    assert(d.filter(Curation.stratifiedAccept(col("s"), col("t"),
      Seq("a" -> 0.0))).count() == 0)
  }
}
