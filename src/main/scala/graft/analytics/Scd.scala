package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) construction from a change-event
  * stream: collapse consecutive runs of the same attribute value per
  * key into one validity interval `[valid_from, valid_to)`; the open
  * interval (`valid_to` null) is the current version.
  *
  * Scale shape: two window passes over the SAME (key, time) ordering —
  * one shuffle on the key, both windows reuse its sort. The run
  * collapse is the standard gaps-and-islands sum-of-change-flags; no
  * self-join, no per-key collect. Callers must supply a tie-break
  * column that makes (key, ts, tieBreak) unique, or run boundaries are
  * nondeterministic.
  */
object Scd {

  def type2(
      changes: DataFrame,
      key: Column,
      ts: Column,
      attr: Column,
      tieBreak: Column): DataFrame = {
    val byTime = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val runs = changes
      .select(key.as("k"), ts.as("t"), attr.as("a"), tieBreak.as("tb"))
      .withColumn("chg",
        when(lag(col("a"), 1).over(byTime).isNull
          || lag(col("a"), 1).over(byTime) =!= col("a"), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(byTime))
    val byRun = Window.partitionBy("k").orderBy("run")
    runs
      .groupBy(col("k"), col("run"))
      .agg(min(col("a")).as("a"), min(col("t")).as("valid_from"),
        count(lit(1)).as("n_changes"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
