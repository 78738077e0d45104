package graft.analytics

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The native single-pass as-of join must be indistinguishable from
  * the portable union+window operator — same inputs, same output
  * schema, same rows — while planning as one merge between two
  * per-side exchanges.
  */
class AsOfJoinNativeSpec extends AnyFunSuite with SparkTestSession {

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_id").collect().toSeq

  test("matches the union+window operator on the events fixture") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001").select(
      col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
    val clicks = ev.filter(col("event_type") === "click")
    val reference = AsOfJoin.asOf(purchases, clicks,
      "user_id", "ts_us", "event_id", payloadCols = Seq("event_id", "ts_us"))
    val native = AsOfJoinNative.asOf(purchases, clicks,
      "user_id", "ts_us", "event_id", payloadCols = Seq("event_id", "ts_us"))
    assert(native.schema === reference.schema)
    assert(sorted(native) === sorted(reference))
  }

  test("plans as the single-pass merge with one exchange per side") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 20L, 101L)).toDF("k", "ts_us", "id")
    val r = Seq((1L, 5L, 200L, "a"), (1L, 9L, 201L, "b"))
      .toDF("k", "ts_us", "id", "v")
    val df = AsOfJoinNative.asOf(l, r, "k", "ts_us", "id", Seq("v"))
    df.collect()
    // nodeName strips the Exec suffix; examine the final plan only
    // (AQE's toString repeats the initial plan below it)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("GraftAsOfJoin"), s"native exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly two per-side exchanges:\n$plan")
  }

  test("latest-ts wins, ties break on greatest id, misses null-extend") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L), (1L, 4L, 2L), (9L, 10L, 3L))
      .toDF("k", "ts_us", "id")
    val r = Seq(
      (1L, 5L, 20L, "older"), (1L, 10L, 21L, "tie-low"),
      (1L, 10L, 22L, "tie-high"), (1L, 11L, 23L, "future"))
      .toDF("k", "ts_us", "id", "v")
    val out = AsOfJoinNative.asOf(l, r, "k", "ts_us", "id", Seq("v"))
      .orderBy("id").collect()
    // id=1 (ts 10): rows at ts 10 qualify, greatest id (22) wins
    assert(out(0).getString(3) === "tie-high")
    // id=2 (ts 4): nothing at-or-before → null
    assert(out(1).isNullAt(3))
    // id=3 (key 9): no right rows for the key → null
    assert(out(2).isNullAt(3))
  }

  test("null keys and timestamps never match but rows survive") {
    import spark.implicits._
    val l = Seq(
      (Option(1L), Option(10L), 1L),
      (Option.empty[Long], Option(10L), 2L),
      (Option(1L), Option.empty[Long], 3L))
      .toDF("k", "ts_us", "id")
    val r = Seq(
      (Option(1L), Option(5L), 20L, "hit"),
      (Option.empty[Long], Option(1L), 21L, "nullkey"),
      (Option(1L), Option.empty[Long], 22L, "nullts"))
      .toDF("k", "ts_us", "id", "v")
    val out = AsOfJoinNative.asOf(l, r, "k", "ts_us", "id", Seq("v"))
      .orderBy("id").collect()
    assert(out.length === 3)
    assert(out(0).getString(3) === "hit") // null-ts right row skipped
    assert(out(1).isNullAt(3)) // null left key
    assert(out(2).isNullAt(3)) // null left ts
  }

  test("empty right side null-extends every left row") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "ts_us", "id")
    val r = Seq.empty[(Long, Long, Long, String)].toDF("k", "ts_us", "id", "v")
    val out = AsOfJoinNative.asOf(l, r, "k", "ts_us", "id", Seq("v")).collect()
    assert(out.length === 1 && out(0).isNullAt(3))
  }

  test("random corpora agree with the union+window operator") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val lf = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(50).toLong, rnd.nextInt(100000).toLong))
        .distinct.toDF("k", "ts_us", "id")
      val rf = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(50).toLong, rnd.nextInt(100000).toLong))
        .distinct.map { case (k, t, i) => (k, t, i, s"v$i") }
        .toDF("k", "ts_us", "id", "v")
      for (tol <- Seq(None, Some(0L), Some(7L), Some(1000L))) {
        val a = AsOfJoinNative.asOf(lf, rf, "k", "ts_us", "id", Seq("v"), tol)
          .orderBy("k", "ts_us", "id").collect().toSeq
        val b = AsOfJoin.asOf(lf, rf, "k", "ts_us", "id", Seq("v"), tol)
          .orderBy("k", "ts_us", "id").collect().toSeq
        assert(a === b, s"trial $trial tol=$tol diverged")
      }
    }
  }

  test("20k-row skewed corpus agrees across partition boundaries") {
    // one hot key holding half the rows (long key group spanning sort
    // runs) plus a wide tail across all shuffle partitions; duplicates
    // ARE allowed — identical (k, ts, id) right rows are
    // indistinguishable, so either copy matching is the same output
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def gen(n: Int) = Seq.fill(n) {
      val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(200).toLong
      (k, rnd.nextInt(2000).toLong, rnd.nextInt(1000000).toLong)
    }
    val lf = gen(10000).toDF("k", "ts_us", "id")
    val rf = gen(10000).map { case (k, t, i) => (k, t, i, i * 31) }
      .toDF("k", "ts_us", "id", "v")
    for (tol <- Seq(None, Some(50L))) {
      val a = AsOfJoinNative.asOf(lf, rf, "k", "ts_us", "id", Seq("v"), tol)
        .orderBy("k", "ts_us", "id").collect().toSeq
      val b = AsOfJoin.asOf(lf, rf, "k", "ts_us", "id", Seq("v"), tol)
        .orderBy("k", "ts_us", "id").collect().toSeq
      assert(a === b, s"tol=$tol diverged")
    }
  }

  test("tolerance discards stale matches in both implementations") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L), (1L, 103L, 2L)).toDF("k", "ts_us", "id")
    val r = Seq((1L, 98L, 20L, "recent")).toDF("k", "ts_us", "id", "v")
    for (impl <- Seq(AsOfJoinNative.asOf _, AsOfJoin.asOf _)) {
      val out = impl(l, r, "k", "ts_us", "id", Seq("v"), Some(3L))
        .orderBy("id").collect()
      assert(out(0).getString(3) === "recent") // 100-98 = 2 <= 3
      assert(out(1).isNullAt(3)) // 103-98 = 5 > 3: stale, discarded
    }
  }

  test("malformed marker use fails analysis loudly") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "ts_us", "id")
    val r = Seq((1L, 5L, 2L)).toDF("k2", "ts2", "id2")
    // no equi-key conjunct alongside the marker — analysis is eager,
    // so the rule rejects the plan at join construction already
    val e = intercept[AnalysisException] {
      l.join(r, call_function("graft_asof_marker",
        col("ts_us"), col("ts2"), col("id2")))
    }
    assert(e.getMessage.contains("graft_asof_marker"))
    assert(e.getMessage.contains("equi-key"))
  }
}
