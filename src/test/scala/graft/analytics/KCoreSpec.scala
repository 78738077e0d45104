package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class KCoreSpec extends AnyFunSuite with SparkTestSession {

  private def edges(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("2-core of a triangle with a pendant chain is the triangle") {
    // a-b-c triangle, then a tail c-d-e: peeling removes e (deg 1),
    // then d; the triangle survives with degree 2 everywhere.
    val e = edges(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
    val core = KCore.kCore(e, col("u"), col("v"), k = 2)
      .orderBy("n").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(core.toSeq === Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }

  test("bounded peel at convergence depth equals the fixpoint core") {
    val e = edges(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
    val bounded = KCore.peelBounded(e, col("u"), col("v"), k = 2, rounds = 3)
      .orderBy("n").collect().toSeq
    val fix = KCore.kCore(e, col("u"), col("v"), k = 2)
      .orderBy("n").collect().toSeq
    assert(bounded === fix)
  }

  test("zero rounds returns raw degrees; high k empties the graph") {
    val e = edges(("a", "b"), ("b", "c"))
    val raw = KCore.peelBounded(e, col("u"), col("v"), k = 2, rounds = 0)
      .orderBy("n").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(raw.toSeq === Seq(("a", 1L), ("b", 2L), ("c", 1L)))
    assert(KCore.kCore(e, col("u"), col("v"), k = 3).count() === 0L)
  }
}
