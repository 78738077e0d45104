package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint (guide §3.1 broadcast safety).
  *
  * The iterative operators hint `broadcast()` on relations whose
  * cardinality is bounded by something the driver already knows — a
  * frontier's row count, a connected-components fixpoint's edge count.
  * Those bounds are data-dependent: "duplicates-bounded" is broadcast-
  * small on a lightly-duplicated corpus and corpus-fraction-sized on a
  * heavily-duplicated one (r19 verdict #3), so an unconditional hint is
  * a driver/executor OOM waiting for the wrong dataset. This gate keeps
  * the hint only while the driver-known row bound is under a ceiling;
  * past it the relation is returned unhinted and the planner falls back
  * to a shuffle join — slower, never fatal.
  *
  * The ceiling is rows, not bytes, because every gated relation here is
  * a narrow id/label projection (8–64 B/row): the 10M default is
  * ~100 MB–1 GB framed, inside the guide's "few hundred MB is fine"
  * band and far under Spark's hard 8 GB / 512M-row broadcast cap.
  * Override per deployment with `spark.graft.broadcast.maxRows`.
  */
object BroadcastGate {

  val ConfKey = "spark.graft.broadcast.maxRows"
  val DefaultMaxRows = 10000000L

  def maxRows(df: DataFrame): Long =
    df.sparkSession.conf.get(ConfKey, DefaultMaxRows.toString).toLong

  /** `broadcast(df)` while `boundRows` (a driver-known upper bound on
    * df's row count — exact counts and overestimates both safe) is
    * within the ceiling; `df` unhinted otherwise.
    */
  def ifUnder(df: DataFrame, boundRows: Long): DataFrame =
    if (boundRows <= maxRows(df)) broadcast(df) else df
}
