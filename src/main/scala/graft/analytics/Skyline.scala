package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional skyline (Pareto frontier): the rows not dominated by
  * any other row of the same group, minimizing one measure and
  * maximizing the other — "cheapest for its capability" queries.
  *
  * The definitional formulation is a quadratic dominance anti-join
  * (`NOT EXISTS` over a theta predicate). For two dimensions the
  * frontier is a single sorted pass: order by cost, and a row survives
  * iff its gain exceeds every strictly-cheaper row's gain (and is not
  * beaten at equal cost). Both tests are RANGE-frame window maxima that
  * SHARE one (group, cost) sort — so the whole operator is one shuffle,
  * no self-join, and each group's frontier is found independently
  * (partition-parallel at any group count).
  *
  * Dominance: q dominates p iff q.cost <= p.cost AND q.gain >= p.gain
  * with at least one strict. Duplicate (cost, gain) points do not
  * dominate each other — both survive, matching the NOT EXISTS oracle.
  *
  * Null contract: rows whose cost or gain is NULL (or fails the long
  * cast) are EXCLUDED from the result — dominance is undefined on an
  * incomparable point, and silently keeping it would also poison the
  * window maxima for its group. Filter-or-impute upstream to keep them.
  */
object Skyline {

  /** @param cost integral measure to minimize (quantize doubles first)
    * @param gain integral measure to maximize
    * @return input rows restricted to the per-group Pareto frontier
    */
  def frontier2D(
      df: DataFrame,
      grp: Column,
      cost: Column,
      gain: Column): DataFrame = {
    // The caller's row travels packed in a single struct so the working
    // columns live in a fresh 4-name projection — a caller column named
    // __c (or anything else) can never be captured or clobbered.
    val cols = df.columns
    val base = Window.partitionBy("__g").orderBy("__c")
    val strictlyCheaper = base.rangeBetween(Window.unboundedPreceding, -1)
    val cheaperOrEqual = base.rangeBetween(Window.unboundedPreceding, 0)
    df.select(
        struct(cols.map(col).toIndexedSeq: _*).as("__row"),
        grp.as("__g"), cost.cast("long").as("__c"), gain.cast("long").as("__v"))
      .filter(col("__c").isNotNull && col("__v").isNotNull)
      .select(col("__row"), col("__g"), col("__c"), col("__v"),
        max(col("__v")).over(strictlyCheaper).as("__m_lt"),
        max(col("__v")).over(cheaperOrEqual).as("__m_le"))
      .filter(
        (col("__m_lt").isNull || col("__m_lt") < col("__v"))
          && col("__m_le") <= col("__v"))
      .select(col("__row.*"))
  }
}
