package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Closed-form checks for [[TokenGraph.hitsE6]] and
  * [[RandomProjection]] on graphs/vectors small enough to verify by
  * hand.
  */
class HitsProjectionSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("HITS separates the hub from the authority on a star digraph") {
    // h1,h2,h3 all point at x; x points at y.
    val edges = Seq(("h1", "x"), ("h2", "x"), ("h3", "x"), ("x", "y"))
      .toDF("w1", "w2")
    val out = TokenGraph.hitsE6(spark, edges, iters = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // x is the unique top authority (3 hubs point at it); the three
    // h-nodes are the top hubs; y's only pointer is the weak hub x.
    assert(out("x")._1 == 1000000L)
    assert(Seq("h1", "h2", "h3").forall(h => out(h)._2 == 1000000L))
    assert(out("y")._1 < 1000000L && out("y")._1 > 0L)
    // h-nodes have no in-edges -> authority 0; y has no out-edges -> hub 0
    assert(Seq("h1", "h2", "h3").forall(h => out(h)._1 == 0L))
    assert(out("y")._2 == 0L)
  }

  test("HITS deduplicates repeated edges") {
    val once = Seq(("a", "b"), ("c", "b")).toDF("w1", "w2")
    val dup = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("c", "b"))
      .toDF("w1", "w2")
    val r1 = TokenGraph.hitsE6(spark, once, 2).orderBy("token").collect()
    val r2 = TokenGraph.hitsE6(spark, dup, 2).orderBy("token").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("projection components are the exact signed sums of the quantized vector") {
    val dim = 4
    val emb = Seq((1L, Seq(0.001f, -0.002f, 0.003f, 0.0005f)))
      .toDF("vec_id", "embedding")
    val out = RandomProjection.project(emb, "vec_id", "embedding",
      outDim = 3, dim = dim).head().getSeq[Long](1)
    val planes = TextHash.hyperplanes(3, dim)
    val q = Seq(1L, -2L, 3L, 1L) // round(x*1000); 0.0005*1000 rounds to 1
    val expected = planes.map(p =>
      p.zip(q).map { case (s, v) => s * v }.sum)
    assert(out == expected)
  }

  test("projected norm is the exact sum of squares") {
    val emb = Seq((1L, Seq(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val p = RandomProjection.project(emb, "vec_id", "embedding", 2, 2)
      .withColumn("n", RandomProjection.normSq(col("proj")))
      .head()
    val proj = p.getSeq[Long](1)
    assert(p.getLong(2) == proj.map(x => x * x).sum)
  }
}
