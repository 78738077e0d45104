package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextChunkerSpec extends AnyFunSuite with SparkTestSession {

  private def doc(n: Int) = {
    import spark.implicits._
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
  }

  private def chunks(n: Int, size: Int, stride: Int) =
    TextChunker.chunkTokens(doc(n), col("doc_id"), col("text"), size, stride)
      .orderBy("chunk_idx").collect()

  test("short documents yield exactly one chunk") {
    val r = chunks(5, 8, 4)
    assert(r.length == 1 && r(0).getLong(2) == 5L)
    assert(r(0).getString(3) == "t1 t2 t3 t4 t5")
  }

  test("boundary: n == chunkSize is one chunk; n == chunkSize+1 is two") {
    assert(chunks(8, 8, 4).length == 1)
    val r = chunks(9, 8, 4)
    assert(r.length == 2)
    assert(r(0).getString(3).startsWith("t1 ") && r(1).getString(3) == "t5 t6 t7 t8 t9")
  }

  test("overlap layout: chunk i starts at token i*stride+1 and every token is covered") {
    val r = chunks(20, 8, 5)
    // 1 + ceil((20-8)/5) = 4 chunks
    assert(r.length == 4)
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getString(3).split(" ").head == s"t${i * 5 + 1}")
    }
    // final chunk reaches the last token
    assert(r.last.getString(3).split(" ").last == "t20")
    val covered = r.flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 20).map(i => s"t$i").toSet)
  }

  test("chunking is map-side only: no Exchange in the plan") {
    val plan = TextChunker.chunkTokens(doc(30), col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
