package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Queries without an oracle get the
  * driver's weaker rows-only check.
  *
  * Contract (see the driver spec): result column names must match the
  * oracle's aliases exactly — the comparison sorts columns by name and
  * hashes values. Both sides therefore alias every computed column and
  * end in a deterministic ORDER BY.
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(fn: (SparkSession, String) => DataFrame, oracle: String): QuerySpec =
    QuerySpec(fn, Some(oracle))
}
