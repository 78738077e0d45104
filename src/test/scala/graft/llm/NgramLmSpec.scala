package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Closed-form checks of [[NgramLm]] on a corpus small enough to do
  * the add-1 arithmetic by hand, plus the short-document edge cases.
  */
class NgramLmSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("bigram LM scores match hand-computed add-1 smoothing") {
    // corpus: "a b a b" and "a b c"; vocab = {a,b,c}, V=3
    // bigrams: d1: (a,b),(b,a),(a,b)   d2: (a,b),(b,c)
    // c2(a,b)=3 c2(b,a)=1 c2(b,c)=1 ; c1(a)=3 c1(b)=2
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = NgramLm.scoreDocs(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // p(a,b) = (3+1)*1e6 div (3+3) = 666666
    // p(b,a) = (1+1)*1e6 div (2+3) = 400000
    // p(b,c) = (1+1)*1e6 div (2+3) = 400000
    // d1: (666666+400000+666666) div 3 = 577777
    // d2: (666666+400000) div 2 = 533333
    assert(out(1L) == ((3L, 577777L)))
    assert(out(2L) == ((2L, 533333L)))
  }

  test("documents with fewer than two tokens contribute and receive nothing") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val out = NgramLm.scoreDocs(docs, col("doc_id"), col("text"))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(3L))
    // the singleton token still counts toward V: vocab = {solo,x,y}
    // p(x,y) = (1+1)*1e6 div (1+3) = 500000
    assert(out.head().getLong(2) == 500000L)
  }

  test("extra whitespace is ignored by tokenization") {
    val a = NgramLm.scoreDocs(
      Seq((1L, "a  b   a b")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).head()
    val b = NgramLm.scoreDocs(
      Seq((1L, "a b a b")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).head()
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2))
  }
}
