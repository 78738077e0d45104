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
    val base = Window.partitionBy("__g").orderBy("__c")
    val strictlyCheaper = base.rangeBetween(Window.unboundedPreceding, -1)
    val cheaperOrEqual = base.rangeBetween(Window.unboundedPreceding, 0)
    df.withColumn("__g", grp)
      .withColumn("__c", cost.cast("long"))
      .withColumn("__v", gain.cast("long"))
      .withColumn("__m_lt", max(col("__v")).over(strictlyCheaper))
      .withColumn("__m_le", max(col("__v")).over(cheaperOrEqual))
      .filter(
        (col("__m_lt").isNull || col("__m_lt") < col("__v"))
          && col("__m_le") <= col("__v"))
      .drop("__g", "__c", "__v", "__m_lt", "__m_le")
  }
}
