package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape guards for the round-14 single-evaluation staging.
  *
  * Higher-order array expressions are CodegenFallback, so there is no
  * common-subexpression elimination across a select list: an expensive
  * array expression referenced N times is EVALUATED N times. The fix is
  * the staged-Project idiom — materialize it once under an alias, read
  * the attribute downstream — which holds only because CollapseProject
  * refuses to fold a non-cheap alias referenced more than once. These
  * specs pin that post-optimization shape, so a future Spark upgrade
  * (or a careless refactor inlining the alias) fails HERE with a plan
  * diff instead of silently multiplying the map-stage cost — the exact
  * regression class the un-prunable bench caught at 21.8 s on q29.
  */
class StagedEvaluationPlanSpec extends AnyFunSuite with SparkTestSession {

  /** A PARQUET-backed fixture: a LocalRelation source would let
    * ConvertToLocalRelation pre-evaluate the whole projection at
    * optimization time, leaving no plan to assert on.
    */
  private lazy val docs = {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-stagedplan").resolve("docs").toString
    Seq((1L, "alpha beta gamma delta epsilon"), (2L, "one two three"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  /** Occurrences of `needle` in the OPTIMIZED plan rendering. */
  private def countInPlan(df: org.apache.spark.sql.DataFrame, needle: String): Int =
    needle.r.findAllIn(df.queryExecution.optimizedPlan.toString).length

  test("fingerprint evaluates the hashed-shingle array once (staged alias survives optimization)") {
    val df = TextAnalysis.fingerprint(docs, col("doc_id"), col("text"))
    // the shingle pipeline contains exactly one split(text) — four
    // inlined copies (one per aggregation) is the pre-fix shape
    assert(countInPlan(df, "split\\(") == 1,
      s"expected ONE split in the optimized plan:\n${df.queryExecution.optimizedPlan}")
    // and the aggregations read the staged attribute, so the stage is
    // a separate Project (two Projects total: stage + aggregations)
    assert(countInPlan(df, "(?m)^Project") + countInPlan(df, "\\+- Project") >= 2,
      s"staging Project was folded away:\n${df.queryExecution.optimizedPlan}")
    // behavior: identical values to the unstaged formulation
    val rows = df.orderBy("doc_id").collect()
    assert(rows.length == 2 && rows.forall(_.getLong(4) > 0L))
  }

  test("shingles let-binds the word array (single split even with multiple consumers)") {
    // One projection using the shingle array twice — with the
    // let-binding the split still appears once per shingles() call,
    // and each call's array is built from a lambda-bound word array.
    val df = docs.select(
      size(Dedup.shingles(col("text"))).as("a"),
      Dedup.shingles(col("text"))(0).as("b"))
    // two shingles() calls → two splits, NOT tokens× re-evaluation
    // (the per-element capture is invisible in plan text; what this
    // pins is that the let-binding idiom — transform over a singleton
    // array — survived optimization: lambdafunction over array(...)
    // wrappers are still present)
    assert(countInPlan(df, "split\\(") == 2,
      s"unexpected split count:\n${df.queryExecution.optimizedPlan}")
    assert(countInPlan(df, "array\\(filter\\(split") == 2,
      s"singleton-array let-binding was rewritten away:\n${df.queryExecution.optimizedPlan}")
    val r = df.collect()
    assert(r.forall(row => row.getInt(0) > 0 && row.getString(1).nonEmpty))
  }

  test("schema inference stages the variant string rendering once per value") {
    import graft.etl.SchemaInference
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft-stagedplan").resolve("raw").toString
    Seq("""{"_id":1,"s":"2024-01-01","n":2.5}""").toDF("raw")
      .write.mode("overwrite").parquet(p)
    val df = SchemaInference.inferSchema(spark.read.parquet(p), "raw")
    val plan = df.queryExecution.optimizedPlan.toString
    // the sniff ladder reads the staged rendering — exactly one
    // variant→string try_cast under the explode, not one per guard
    assert("cast\\(vv#\\d+ as string\\)".r.findAllIn(plan).length == 1,
      s"expected ONE staged variant→string cast:\n$plan")
    // and the dispatch is the O(1) tag, never schema_of_variant
    assert(!plan.contains("schema_of_variant"),
      s"schema_of_variant crept back into inference dispatch:\n$plan")
    assert(df.collect().length == 3)
  }
}
