package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SequencePackerSpec extends AnyFunSuite with SparkTestSession {

  private def reference(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var before = 0L
    rows.sortBy(_._1).map { case (id, n) =>
      val bin = before / budget
      before += n
      id -> bin
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], budget: Long, width: Long): Map[Long, Long] = {
    import spark.implicits._
    SequencePacker.packBins(
      rows.toDF("doc_id", "n"), col("doc_id"), col("n"), budget, width)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("two-level prefix sum matches the sequential scan exactly") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => i -> (1L + rnd.nextInt(300)))
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      assert(run(rows, budget = 512L, width) == reference(rows, 512L), s"width=$width")
    }
  }

  test("sparse non-contiguous ids pack in id order") {
    val rows = Seq(5L -> 10L, 100L -> 10L, 7L -> 25L, 9999L -> 3L, 50L -> 40L)
    assert(run(rows, budget = 30L, width = 64L) == reference(rows, 30L))
  }

  test("a document larger than the budget still gets the bin of its start offset") {
    val rows = Seq(1L -> 5L, 2L -> 100L, 3L -> 5L)
    val got = run(rows, budget = 10L, width = 2L)
    assert(got(1L) == 0L && got(2L) == 0L && got(3L) == 10L)
  }
}
