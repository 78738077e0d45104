package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.analytics.ConstraintSuite.{Satisfies, SubsetOf, Unique}

/** Library-level behavior of [[ConstraintSuite]] the q245 gate can't
  * isolate: null predicate results counting as violations, uniqueness
  * over composite keys, the non-broadcast referential path, and the
  * single-scan plan shape for row predicates.
  */
class ConstraintSuiteSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("row predicates: metric/violations exact, null predicate = violation") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "c"), (4L, null))
      .toDF("v", "s")
    val out = byName(ConstraintSuite.evaluate(df, Seq(
      Satisfies("v_complete", col("v").isNotNull),
      // v > 1 is NULL for the null row -> must count as a violation
      Satisfies("v_gt1", col("v") > 1),
      Satisfies("all_ok", lit(true)))))
    assert(out("v_complete") == ((750000L, 1L, "fail")))
    assert(out("v_gt1") == ((500000L, 2L, "fail")))
    assert(out("all_ok") == ((1000000L, 0L, "pass")))
  }

  test("uniqueness over a composite key counts duplicate tuples") {
    val df = Seq((1, "x"), (1, "y"), (1, "x"), (2, "x"))
      .toDF("a", "b")
    val out = byName(ConstraintSuite.evaluate(df, Seq(
      Unique("pk", Seq(col("a"), col("b"))),
      Unique("a_alone", Seq(col("a"))))))
    // 4 rows, 3 distinct (a,b) tuples -> 1 violation
    assert(out("pk") == ((750000L, 1L, "fail")))
    assert(out("a_alone") == ((500000L, 2L, "fail")))
  }

  test("referential integrity: nulls ignored, violations counted, both paths") {
    val df = Seq[java.lang.Long](1L, 2L, 99L, null).toDF("k")
    val ref = Seq(1L, 2L, 3L, 3L).toDF("rk") // dup ref keys must not multiply
    for (bcast <- Seq(true, false)) {
      val out = byName(ConstraintSuite.evaluate(df, Seq(
        SubsetOf("fk", col("k"), ref, "rk", broadcastRef = bcast))))
      // 99 is the only violation; the null k is not evidence either way
      assert(out("fk") == ((750000L, 1L, "fail")), s"broadcastRef=$bcast")
    }
  }

  test("a suite of row predicates compiles to one aggregate scan") {
    val df = Seq(1, 2, 3).toDF("v")
    val checks = (1 to 8).map(i => Satisfies(s"c$i", col("v") >= i))
    val plan = ConstraintSuite.evaluate(df, checks)
      .queryExecution.optimizedPlan
    // exactly one scan of the input relation: all 8 predicates fold
    // into a single Aggregate, no per-constraint re-read
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}:\n$plan")
  }

  test("a suite WITH broadcast FK checks still scans the audited table once") {
    // Dimension FKs fold into the shared aggregate via broadcast left
    // joins — the audited relation must appear EXACTLY once in the
    // optimized plan even with row + unique + two FK constraints
    // (round-11 advice: no per-FK recount of the audited table).
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-fk")
    Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("k", "d")
      .write.parquet(dir.resolve("fact").toString)
    val fact = spark.read.parquet(dir.resolve("fact").toString)
    val ref1 = Seq(1L, 2L, 3L).toDF("rk")
    val ref2 = Seq(10L, 20L).toDF("rd")
    val out = ConstraintSuite.evaluate(fact, Seq(
      Satisfies("k_complete", col("k").isNotNull),
      Unique("pk", Seq(col("k"))),
      SubsetOf("fk1", col("k"), ref1, "rk"),
      SubsetOf("fk2", col("d"), ref2, "rd")))
    // the fact table is the only file-backed relation (refs are local),
    // so "exactly one LogicalRelation" IS "audited table scanned once"
    val factScans = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(factScans.size == 1,
      s"expected 1 audited-table scan, got ${factScans.size}:\n" +
        out.queryExecution.optimizedPlan)
    val m = byName(out)
    assert(m("fk1") == ((1000000L, 0L, "pass")))
    assert(m("fk2") == ((666666L, 1L, "fail")))
    assert(m("k_complete") == ((1000000L, 0L, "pass")))
    assert(m("pk") == ((1000000L, 0L, "pass")))
  }

  test("hostile check names (quotes, commas, backticks, dots) ride as data") {
    // names never enter a parsed surface — positional aggregate
    // aliases + typed explode — so SQL metacharacters in a
    // caller-supplied name must neither break parsing nor mis-bind
    val df = Seq(1, 2, 3).toDF("v")
    val names = Seq("it's, tricky", "back`tick", "a.b\"c", "stack(1, 'x')")
    val out = byName(ConstraintSuite.evaluate(df,
      names.zipWithIndex.map { case (n, i) => Satisfies(n, col("v") > i) } :+
        Unique("dotted.unique", Seq(col("v")))))
    assert(out(names.head) == ((1000000L, 0L, "pass")))
    assert(out(names(1)) == ((666666L, 1L, "fail")))
    assert(out(names(2)) == ((333333L, 2L, "fail")))
    assert(out(names(3)) == ((0L, 3L, "fail")))
    assert(out("dotted.unique") == ((1000000L, 0L, "pass")))
  }

  test("duplicate check names are rejected") {
    val df = Seq(1).toDF("v")
    intercept[IllegalArgumentException] {
      ConstraintSuite.evaluate(df, Seq(
        Satisfies("x", lit(true)), Satisfies("x", lit(false))))
    }
  }
}
