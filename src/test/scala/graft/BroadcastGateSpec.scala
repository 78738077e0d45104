package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BroadcastGateSpec extends AnyFunSuite with SparkTestSession {

  private def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.toString.contains("UnresolvedHint")

  test("ifUnder hints below the ceiling, passes through above it") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("id")
    assert(hasBroadcastHint(BroadcastGate.ifUnder(df, 3L)))
    assert(!hasBroadcastHint(
      BroadcastGate.ifUnder(df, BroadcastGate.maxRows(df) + 1)))
  }

  test("ceiling is conf-overridable") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    val prev = spark.conf.getOption(BroadcastGate.ConfKey)
    try {
      spark.conf.set(BroadcastGate.ConfKey, "2")
      assert(BroadcastGate.maxRows(df) === 2L)
      assert(hasBroadcastHint(BroadcastGate.ifUnder(df, 2L)))
      assert(!hasBroadcastHint(BroadcastGate.ifUnder(df, 3L)))
    } finally prev match {
      case Some(v) => spark.conf.set(BroadcastGate.ConfKey, v)
      case None => spark.conf.unset(BroadcastGate.ConfKey)
    }
  }

  test("gated operators produce identical results with the hint forced off") {
    // The 100 TB fallback path: a ceiling of 0 drops every gated hint
    // (shuffle joins everywhere); results must be identical.
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L))
      .toDF("src", "dst")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val corpus = Seq(1L, 2L, 3L, 4L, 7L, 9L).toDF("doc_id")

    def results() = CacheScope.scoped {
      val reach = graft.analytics.ShortestPath.reachable(edges, 0L)
        .collect().map(_.getLong(0)).toSet
      val kept = graft.llm.Dedup
        .dropNearDuplicates(corpus, "doc_id", pairs)
        .collect().map(_.getLong(0)).toSet
      (reach, kept)
    }

    val hinted = results()
    val prev = spark.conf.getOption(BroadcastGate.ConfKey)
    val unhinted =
      try {
        spark.conf.set(BroadcastGate.ConfKey, "0")
        results()
      } finally prev match {
        case Some(v) => spark.conf.set(BroadcastGate.ConfKey, v)
        case None => spark.conf.unset(BroadcastGate.ConfKey)
      }
    assert(hinted === unhinted)
    assert(hinted._1 === Set(0L, 1L, 2L))
    assert(hinted._2 === Set(1L, 4L, 7L))
  }
}
