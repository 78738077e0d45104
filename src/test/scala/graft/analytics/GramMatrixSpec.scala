package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GramMatrixSpec extends AnyFunSuite with SparkTestSession {

  test("gram cells equal the naive per-pair sums on a small matrix") {
    import spark.implicits._
    val rows = Seq(
      Seq(1.0f, 2.0f, -1.0f),
      Seq(0.5f, 0.0f, 3.0f),
      Seq(-2.0f, 1.5f, 0.25f))
    val df = rows.toDF("embedding")
    val got = GramMatrix.upperTriangle(df, col("embedding"), scale = 1000)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val q = rows.map(_.map(x => math.round(x * 1000.0)))
    for (i <- 0 until 3; j <- i until 3) {
      val want = q.map(r => r(i) * r(j)).sum
      assert(got((i, j)) == want, s"cell ($i,$j)")
    }
    assert(got.size == 6)
  }

  test("plan has exactly one exchange and no join") {
    import spark.implicits._
    val df = (1 to 100).map(i => Seq(i.toFloat, (i * 2).toFloat)).toDF("embedding")
    val g = GramMatrix.upperTriangle(df, col("embedding"), scale = 1000)
    val plan = g.queryExecution.executedPlan.toString
    // the matrix is never joined against itself and shuffles only the
    // d^2 partial cells — one hash exchange for the final aggregate
    // (the orderBy adds a range exchange over d^2 rows, which is noise)
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$plan")
  }
}
