package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average with a dyadic smoothing
  * factor (α = 1/2): s₁ = x₁, sₙ = sₙ₋₁/2 + xₙ/2.
  *
  * Division by two is EXACT in IEEE doubles and addition is exactly
  * rounded, so a pinned fold order makes the final value bit-identical
  * in any engine that evaluates the same recurrence — which is what
  * lets the gate hash-match a DuckDB recursive CTE. Non-dyadic α would
  * need a multiply per step (still exactly rounded, still portable)
  * but α = 1/2 keeps the proof trivial.
  *
  * Scale shape: one shuffle on the key; the per-key sequence is folded
  * inside a single aggregate (`collect_list` + HOF fold). State is one
  * double per key during the fold; the collected array is bounded by
  * the per-key event count — for unbounded keys, switch to the
  * streaming path (`flatMapGroupsWithState` carries the same one-double
  * state with no collect at all).
  */
object Ewma {

  /** Per-key EWMA over (ts, value) with α = 1/2. `value` should be an
    * exact integer (pre-quantized); (key, ts) must be unique for a
    * deterministic fold order.
    */
  def dyadic(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    val seq = df.select(key.as("k"), ts.as("t"), value.as("v"))
      .groupBy("k")
      .agg(array_sort(collect_list(struct(col("t"), col("v")))).as("seq"))
    seq.select(
      col("k"),
      size(col("seq")).cast("long").as("n_events"),
      aggregate(
        slice(col("seq"), lit(2), greatest(size(col("seq")) - 1, lit(0))),
        element_at(col("seq"), 1).getField("v").cast("double"),
        (acc, x) => acc / lit(2.0) + x.getField("v").cast("double") / lit(2.0))
        .as("ewma"))
  }
}
