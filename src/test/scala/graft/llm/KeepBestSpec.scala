package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class KeepBestSpec extends AnyFunSuite with SparkTestSession {

  test("keepBestPerCluster keeps the highest score per cluster, min id on ties") {
    import spark.implicits._
    val corpus = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster {1,2,3}: 2 and 3 tie on 30 -> 2 wins
      (7L, 5L), (8L, 9L),              // cluster {7,8}: 8 wins on score
      (9L, 1L)                         // singleton: kept untouched
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2")
    val kept = Dedup.keepBestPerCluster(corpus, "doc_id", "score", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(2L, 8L, 9L)))
  }

  test("differs from dropNearDuplicates exactly when the best is not the min id") {
    import spark.implicits._
    val corpus = Seq((1L, 1L), (2L, 99L)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val best = Dedup.keepBestPerCluster(corpus, "doc_id", "score", pairs)
      .select("doc_id").collect().map(_.getLong(0))
    val first = Dedup.dropNearDuplicates(corpus, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0))
    assert(best.sameElements(Array(2L)) && first.sameElements(Array(1L)))
  }
}
