package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.llm.{Dedup, TokenGraph}

/** Unit coverage for the round-7 gated operators (q120–q123) and the
  * scale refinements: interval sweep line, 2-D skyline, KS drift,
  * frontier BFS, degree-oriented triangles, hot-band salting, and
  * PageRank sink redistribution. Each pins the library semantics on
  * controlled input; end-to-end shapes are oracle-gated.
  */
class FrontierOpsSpec extends AnyFunSuite with SparkTestSession {

  test("sweepline peak concurrency matches brute-force interval overlap") {
    import spark.implicits._
    // group a: [0,10) [5,15) [9,12) -> peak 3 at t=9; ends-meet-starts
    // at t=15/15 must NOT double-count: [15,20) starts as [5,15) ends.
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 10L), ("a", 9L, 3L), ("a", 15L, 5L),
      ("b", 0L, 1L), ("b", 1L, 1L), ("b", 2L, 1L))
      .toDF("g", "start", "dur")
    val got = Sweepline.maxConcurrency(iv, col("g"), col("start"), col("dur"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("peak"), r.getAs[Long]("peak_at"))).toMap
    assert(got("a") == ((3L, 9L)))
    // b's back-to-back unit intervals never overlap: peak 1 at t=0
    assert(got("b") == ((1L, 0L)))
  }

  test("skyline equals quadratic dominance filter; caller __c column survives") {
    import spark.implicits._
    val pts = Seq((1L, "g", 10L, 5L), (2L, "g", 10L, 5L), (3L, "g", 5L, 5L),
      (4L, "g", 5L, 9L), (5L, "g", 6L, 1L), (6L, "g", 4L, 2L),
      (7L, "h", 100L, 100L))
    // name a column __c to prove the working names can't be captured
    val df = pts.toDF("id", "grp", "__c", "gain")
    val got = Skyline.frontier2D(df, col("grp"), col("__c"), col("gain"))
      .select("id").as[Long].collect().toSet
    def dominated(p: (Long, String, Long, Long)) = pts.exists(q =>
      q._2 == p._2 && q._3 <= p._3 && q._4 >= p._4 &&
        (q._3 < p._3 || q._4 > p._4))
    assert(got == pts.filterNot(dominated).map(_._1).toSet)
    // pin the exact frontier: 4 kills 1,2 (cheaper AND higher) and its
    // equal-cost neighbor 3 (gain 9 > 5); 6 kills 5; lone 7 survives
    assert(got == Set(4L, 6L, 7L))
    // schema is the caller's, untouched
    assert(Skyline.frontier2D(df, col("grp"), col("__c"), col("gain"))
      .columns.toSeq == df.columns.toSeq)
  }

  test("skyline drops rows with null cost/gain instead of poisoning maxima") {
    import spark.implicits._
    val df = Seq((1L, Some(10L), Some(5L)), (2L, None, Some(99L)),
      (3L, Some(4L), None)).toDF("id", "c", "v")
    val got = Skyline.frontier2D(df, lit("g"), col("c"), col("v"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("ksDriftE6 computes the exact floored-ppm KS gap") {
    import spark.implicits._
    // A = {1,2}, B = {2,3}: F_a(1)=1/2, F_b(1)=0 -> gap 500000 ppm
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)).toDF("p", "v")
    val r = Stats.ksDriftE6(df, col("p"), col("v"), "a", "b").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_a") == 2L && r.head.getAs[Long]("n_b") == 2L)
    assert(r.head.getAs[Long]("n_grid") == 3L)
    assert(r.head.getAs[Long]("ks_e6") == 500000L)
  }

  test("ksDriftE6 excludes NULL values from the grid and the counts") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("b", Some(2L)), ("b", None), ("b", Some(3L))).toDF("p", "v")
    val r = Stats.ksDriftE6(df, col("p"), col("v"), "a", "b").collect().head
    // identical to the no-null A={1,2} B={2,3} case: nulls are not a
    // point on the value axis and must not count toward n_a/n_b
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("n_grid") == 3L)
    assert(r.getAs[Long]("ks_e6") == 500000L)
  }

  test("grid quantiles exclude NULL values") {
    import spark.implicits._
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(2L)), ("g", Some(3L)))
      .toDF("grp", "v")
    val r = GridQuantiles.exact(df, col("grp"), col("v"), Seq("p50" -> ((1, 2))))
      .collect().head
    // n=3 non-null values; type-1 median of {1,2,3} = 2 (null must not
    // shift the cumulative walk the way a nulls-first sort would)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("p50") == 2L)
  }

  test("ksDriftE6 yields NULL (not a division error) when a population is empty") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L)).toDF("p", "v")
    val r = Stats.ksDriftE6(df, col("p"), col("v"), "a", "b").collect()
    assert(r.length == 1)
    assert(r.head.isNullAt(r.head.fieldIndex("ks_e6")))
    // both populations empty -> zero rows, not a null row
    assert(Stats.ksDriftE6(df, col("p"), col("v"), "x", "y").count() == 0L)
  }

  test("bfsHops: empty graph yields zero rows; exhausted frontier short-circuits") {
    import spark.implicits._
    // single-token docs -> no bigram edges at all
    val empty = Seq("one", "two").toDF("text")
    assert(TokenGraph.bfsHops(spark, empty, col("text"), maxHops = 5).count() == 0L)
    // path graph a-b-c: diameter 2, maxHops 10 must still terminate with
    // the right distances (and no phantom rows from the dead rounds)
    val path = Seq("a b c").toDF("text")
    val got = TokenGraph.bfsHops(spark, path, col("text"), maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("degree-oriented triangles: correct count and bounded hub fan-out") {
    import spark.implicits._
    // star: hub h joined to 40 leaves; triangles closed only via
    // (l1,l2) and (l3,l4)
    val leaves = (1 to 40).map(i => f"l$i%02d")
    val star = leaves.map(l => (l, "h")) ++ Seq(("l01", "l02"), ("l03", "l04"))
    val e = star.toDF("u", "v")
    val r = Triangles.countTriangles(e, col("u"), col("v")).collect().head
    assert(r.getAs[Long]("n_triangles") == 2L)
    assert(r.getAs[Long]("n_edges") == 42L)
    // the orientation bound: the degree-40 hub must be a wedge SOURCE for
    // no pairs at all (all its edges point INTO it from degree-1/2/3
    // leaves) — under name orientation "h" would fan out to ~half the
    // leaves. Max out-degree over the oriented relation stays leaf-sized.
    val fanout = Triangles.orientByDegree(e, col("u"), col("v"))
      .groupBy("a").agg(count(lit(1)).as("d"))
    assert(fanout.filter(col("a") === "h").count() == 0L)
    assert(fanout.agg(max("d")).head().getLong(0) <= 3L)
    // per-node participation: the hub closes both triangles, each
    // triangle leaf closes one, the other 36 leaves none (absent)
    val perNode = Triangles.trianglesPerNode(e, col("u"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perNode == Map("h" -> 2L, "l01" -> 1L, "l02" -> 1L,
      "l03" -> 1L, "l04" -> 1L))
  }

  test("salted candidatePairs equals unsalted under a forced hot band") {
    import spark.implicits._
    // 30 docs all sharing band "HOT" (the degenerate bucket), plus a few
    // docs pairing through other bands
    val docs = ((1 to 30).map(i => (i.toLong, Seq("HOT"))) ++
      Seq((41L, Seq("x", "y")), (42L, Seq("y")), (43L, Seq("x"))))
      .toDF("doc_id", "bands")
    def pairs(sf: Int) =
      Dedup.candidatePairs(docs, "doc_id", "bands", saltFactor = sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairs(1)
    assert(plain.size == 30 * 29 / 2 + 2)
    assert(pairs(4) == plain)
    assert(pairs(7) == plain)
  }

  test("partitioned read prunes non-matching directories (planning-time filter)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString
    Seq((1L, "a", "en"), (2L, "b", "de"), (3L, "c", "fr"))
      .toDF("id", "t", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val df = spark.read.parquet(tmp).filter(col("lang") === "en")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty)
    // pruning is physical, not cosmetic: of the three lang directories
    // only en's file was opened
    assert(scan.metrics("numFiles").value == 1L)
  }

  test("grid quantiles match the type-1 definition on ties and skew") {
    import spark.implicits._
    val df = (Seq.fill(7)(("a", 1L)) ++ Seq(("a", 2L), ("a", 2L), ("a", 10L)) ++
      Seq(("b", 5L))).toDF("g", "v")
    val got = GridQuantiles.exact(df, col("g"), col("v"),
      Seq("p50" -> ((1, 2)), "p90" -> ((9, 10))))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p50"), r.getAs[Long]("p90"))).toMap
    // a: n=10, cum(1)=7 -> p50 = 1 (7*2 >= 10); p90: need cum*10 >= 90,
    // cum(2)=9 -> 90 >= 90 -> 2 (not the outlier 10)
    assert(got("a") == ((10L, 1L, 2L)))
    assert(got("b") == ((1L, 5L, 5L)))
  }

  test("grid quantiles: one join regardless of quantile count") {
    import spark.implicits._
    val df = (1L to 20L).map(v => ("g", v)).toDF("g", "v")
    val many = GridQuantiles.exact(df, col("g"), col("v"),
      Seq("p10" -> ((1, 10)), "p25" -> ((1, 4)), "p50" -> ((1, 2)),
        "p75" -> ((3, 4)), "p90" -> ((9, 10)), "p99" -> ((99, 100))))
    // all six quantiles ride ONE cum ⋈ tot join + one aggregate — the
    // per-quantile-join fold would show six
    val joins = many.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length == 1, s"expected 1 join, got ${joins.length}")
    val r = many.collect().head
    assert(r.getAs[Long]("p50") == 10L && r.getAs[Long]("p99") == 20L)
  }

  test("grid quantiles reject malformed fractions instead of dropping groups") {
    import spark.implicits._
    val df = Seq(("g", 1L)).toDF("g", "v")
    for (bad <- Seq((3, 2), (0, 2), (1, 0), (1, -1)))
      intercept[IllegalArgumentException] {
        GridQuantiles.exact(df, col("g"), col("v"), Seq("q" -> bad))
      }
  }

  test("pagerank sink redistribution conserves total mass; default drops it") {
    import spark.implicits._
    // a -> b, b is a sink: without redistribution b's mass drains each
    // round; with it, total stays at 1e6 ppm up to integral-div loss.
    val docs = Seq("a b").toDF("text")
    def total(redistribute: Boolean): Long =
      TokenGraph.pagerankE6(spark, docs, col("text"), iters = 4,
          redistributeSinks = redistribute)
        .agg(sum("pr_e6")).head().getLong(0)
    val kept = total(redistribute = true)
    val dropped = total(redistribute = false)
    assert(kept > dropped)
    assert(math.abs(kept - 1000000L) <= 16L) // <= 2 ppm quantization/round
    assert(dropped < 900000L)
  }

  test("deep pagerank (10 rounds) cuts lineage per round and converges") {
    import spark.implicits._
    // 3-cycle a->b->c->a: no sinks, out-degree 1 everywhere, so the
    // stationary distribution is uniform (≈ 333333 ppm each). Ten
    // unrolled rounds without the per-round localCheckpoint cut blow up
    // analyzer/optimizer time quadratically — completing promptly IS
    // the lineage assertion; the values check it's still PageRank.
    val docs = Seq("a b c a").toDF("text")
    val got = TokenGraph.pagerankE6(spark, docs, col("text"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set("a", "b", "c"))
    got.values.foreach(pr => assert(math.abs(pr - 333333L) <= 40L,
      s"not converged: $got"))
  }
}
