package graft.analytics

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Property-based checks of the round-7 analytics operators against
  * driver-side brute-force references on random inputs: the
  * degree-oriented triangle count must equal the definitional triple
  * count on any graph (orientation invariance), and the sweep-line peak
  * must equal the max pointwise interval overlap.
  */
object FrontierPropertySpec extends Properties("FrontierProperties") {

  private lazy val spark = SparkTestSession.session

  // Spark-job-per-case: cap the case count to keep the suite fast.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val graphGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(3, 14)
    m <- Gen.choose(1, 30)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.toSet

  property("degree-oriented triangle count equals brute-force triple count") =
    forAll(graphGen) { edges =>
      import spark.implicits._
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val has = edges.map(e => e)
      val expected = (for {
        i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
        a = nodes(i); b = nodes(j); c = nodes(k)
        if has((a, b)) && has((a, c)) && has((b, c))
      } yield 1).size.toLong
      val r = Triangles.countTriangles(
        edges.toSeq.toDF("u", "v"), col("u"), col("v")).collect().head
      r.getAs[Long]("n_triangles") == expected &&
        r.getAs[Long]("n_edges") == edges.size.toLong
    }

  private val intervalsGen: Gen[List[(String, Long, Long)]] = for {
    m <- Gen.choose(1, 25)
    iv <- Gen.listOfN(m, for {
      g <- Gen.oneOf("a", "b")
      s <- Gen.choose(0L, 50L)
      d <- Gen.choose(1L, 20L)
    } yield (g, s, d))
  } yield iv

  property("sweep-line peak equals max pointwise [s, s+d) overlap") =
    forAll(intervalsGen) { iv =>
      import spark.implicits._
      val got = Sweepline.maxConcurrency(
        iv.toDF("g", "s", "d"), col("g"), col("s"), col("d"))
        .collect().map(r => r.getAs[String]("g") ->
          (r.getAs[Long]("peak"), r.getAs[Long]("peak_at"))).toMap
      iv.groupBy(_._1).forall { case (g, ivs) =>
        def depth(t: Long) = ivs.count(x => x._2 <= t && t < x._2 + x._3).toLong
        val points = ivs.flatMap(x => Seq(x._2, x._2 + x._3)).distinct.sorted
        val peak = points.map(depth).max
        val peakAt = points.filter(depth(_) == peak).min
        got(g) == ((peak, peakAt))
      }
    }
}
