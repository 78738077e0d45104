package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The property that makes [[BottomKSample]] a sketch: bottom-k of a
  * union equals the re-merged bottom-ks of the shards — plus the
  * nearest-rank arithmetic of both quantile paths.
  */
class BottomKSampleSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def keys(df: org.apache.spark.sql.DataFrame) =
    df.select("key").as[String].collect().toSet

  test("bottom-k sample is mergeable: shard samples re-merge to the global sample") {
    val all = (1 to 500).map(i => (s"row_$i", i.toLong)).toDF("key", "v")
    val global = BottomKSample.sample(all, col("key"), 32)
    val shard1 = BottomKSample.sample(all.filter(col("v") <= 250), col("key"), 32)
    val shard2 = BottomKSample.sample(all.filter(col("v") > 250), col("key"), 32)
    val merged = BottomKSample.sample(
      shard1.drop("__h").unionByName(shard2.drop("__h")), col("key"), 32)
    assert(keys(merged) == keys(global))
    assert(global.count() == 32)
  }

  test("sample is row-order and partitioning independent") {
    val a = (1 to 300).map(i => (s"k$i", i.toLong)).toDF("key", "v")
    val s1 = BottomKSample.sample(a.repartition(7), col("key"), 16)
    val s2 = BottomKSample.sample(a.orderBy(desc("v")).coalesce(1), col("key"), 16)
    assert(keys(s1) == keys(s2))
  }

  test("exact nearest-rank quantiles match the sorted definition") {
    // values 10,20,...,1000 (n=100); rank(q) = (99*q) div 100 + 1
    val df = (1 to 100).map(i => i * 10L).toDF("v")
    val out = BottomKSample.exactQuantiles(df, col("v"), Seq(0, 25, 50, 99, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 10L)     // rank 1
    assert(out(25L) == 250L)   // rank (99*25) div 100 + 1 = 25
    assert(out(50L) == 500L)   // rank 50
    assert(out(99L) == 990L)   // rank 99
    assert(out(100L) == 1000L) // rank 100
  }

  test("sample quantiles read the expected order statistic of the sample") {
    val df = (1 to 64).map(i => (s"k$i", i * 100L)).toDF("key", "v")
    val samp = BottomKSample.sample(df, col("key"), 64) // whole relation
    val out = BottomKSample.sampleQuantiles(samp, col("v"), 64, Seq(0, 50, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // index (63*q) div 100 of the value-sorted sample
    assert(out(0L) == 100L)
    assert(out(50L) == 3200L)  // index 31 -> 32nd smallest
    assert(out(100L) == 6400L)
  }

  test("input smaller than the nominal k still answers every quantile") {
    // indices must come from the ACTUAL sample count: with 5 rows and
    // nominal k=256, index (255*q) div 100 targets rows that don't
    // exist and would silently drop the quantile from the output
    val df = (1 to 5).map(i => (s"k$i", i * 10L)).toDF("key", "v")
    val samp = BottomKSample.sample(df, col("key"), 256)
    val out = BottomKSample.sampleQuantiles(samp, col("v"), 256,
      Seq(0, 50, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 50L, 100L), s"quantiles dropped: $out")
    assert(out(0L) == 10L)    // index (4*0) div 100 = 0
    assert(out(50L) == 30L)   // index (4*50) div 100 = 2
    assert(out(100L) == 50L)  // index 4
  }
}
