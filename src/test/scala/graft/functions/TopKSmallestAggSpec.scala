package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** The bounded-state top-k aggregator must equal the sort-based
  * reference (multiset of the k smallest, ascending) on random data,
  * regardless of partitioning — i.e. the partial/merge path is
  * associative and loses nothing.
  */
object TopKSmallestAggSpec extends Properties("TopKSmallestAgg") {

  private lazy val spark = SparkTestSession.session

  private val dataGen: Gen[(List[Long], Int)] = for {
    xs <- Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))
    k <- Gen.choose(1, 8)
  } yield (xs, k)

  property("equals sorted.take(k) under any partitioning") =
    forAll(dataGen) { case (xs, k) =>
      import spark.implicits._
      val topk = udaf(new TopKSmallestAgg(k))
      val got = xs.toDF("v").repartition(3)
        .agg(topk(col("v")).as("tk"))
        .head().getSeq[Long](0).toList
      got == xs.sorted.take(k)
    }
}
