package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: left events matched to right events of
  * the same key with `leftTs ∈ [rightTs − lookback, rightTs]` — the
  * attribution-style join (clicks to the purchases they preceded) as a
  * REAL watermarked streaming join, not a batch approximation.
  *
  * Mechanics: both sides carry watermarks and the join condition bounds
  * event time on both sides, which is exactly what Spark needs to
  * compute how long each side's state must be retained — click state
  * can be dropped once the watermark passes `ts + lookback`, purchase
  * state once it passes `ts`. Inner-join matches emit as soon as both
  * rows have arrived; state is bounded by watermark + lookback however
  * long the streams run.
  *
  * With `joinType = "leftOuter"` the join also EMITS unmatched left
  * rows null-extended — but only once the watermark proves no future
  * right row can match them (left ts + lookback below the global
  * watermark); unmatched rows newer than that stay in state, correctly
  * unemitted. That eviction-driven emission is the semantic difference
  * from a batch left join and is what q146's oracle encodes explicitly.
  *
  * Callers pass uniquely-named columns on the two sides (the join
  * output keeps both sides' columns).
  */
object StreamJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lookback: String,
      watermark: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(leftTs) >= col(rightTs) - expr(s"INTERVAL $lookback") &&
        col(leftTs) <= col(rightTs),
      joinType)
  }
}
