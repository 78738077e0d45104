package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Penny-exact proportional allocation (largest-remainder method).
  *
  * Distributes an integer group-level amount across the group's rows
  * proportionally to an integer weight, in whole units, such that the
  * allocations sum EXACTLY to the amount: each row gets
  * `floor(amount·w/W)`, and the leftover `amount − Σfloor` units go to
  * the rows with the largest division remainders (ties broken by the
  * caller's key). The invariant `sum(alloc) == amount` holds per group
  * by construction — the property reconciliation jobs are built on.
  *
  * All arithmetic is integral (div/mod on nonnegative BIGINTs), so the
  * result is bit-identical across engines and partitionings. Overflow
  * bound: `amount · max(w)` must fit int64 — quantize accordingly.
  *
  * Scale shape: one shuffle on the group key; the weight-sum window,
  * the floor-sum window, and the remainder ranking all share that
  * partitioning. No group's rows are ever collected.
  */
object Proration {

  /** @param df     input rows
    * @param grp    group key column
    * @param amount integer amount to distribute (constant within group)
    * @param weight nonnegative integer weight per row
    * @param tie    total tiebreak within group (extra leftover units go
    *               to larger remainders first, then smaller `tie`)
    * @return input group key + tie + `alloc` (this row's share)
    */
  def largestRemainder(df: DataFrame, grp: Column, amount: Column,
      weight: Column, tie: Column): DataFrame = {
    val base = df.select(
      grp.as("g"), amount.cast("long").as("amt"),
      weight.cast("long").as("w"), tie.as("t"))
    val part = Window.partitionBy("g")
    val withBase = base
      .withColumn("__W", sum(col("w")).over(part))
      .withColumn("__base", expr("(amt * w) div __W"))
      .withColumn("__rem", expr("(amt * w) % __W"))
    withBase
      .withColumn("__left", col("amt") - sum(col("__base")).over(part))
      .withColumn("__rk",
        row_number().over(part.orderBy(col("__rem").desc, col("t"))))
      .select(
        col("g"), col("t"),
        (col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("alloc"))
  }
}
