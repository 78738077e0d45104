package graft.queries

import org.apache.spark.sql.functions._
import graft.{CacheScope, Tables}

/** Spark 4 SQL-language surface: native recursive CTEs (q299) and the
  * pipe operator syntax (q300). The reference issues only flat
  * SQL/pandas (`repositories/postgres_audit_repository.py:24-111`);
  * these extend the engine's SQL plane to the Spark-4 spec so a user
  * can express iteration and pipelined transforms IN SQL instead of
  * driver-side loops.
  */
object Sql4Queries {

  val specs: Map[String, QuerySpec] = Map(

    // Q299: WITH RECURSIVE — Spark 4's native recursion operator
    // (UnionLoop) walking each customer's order chain in date order
    // and accumulating spend step by step. Depth = orders per
    // customer, a TPC-H constant (~25 at every SF — orders/customer
    // does not grow with scale), so the recursion depth is
    // SF-INVARIANT and each round is one hash join of the frontier
    // against the (ck, rn)-keyed order table — the frontier shrinks
    // monotonically as chains end. The oracle replays the identical
    // recursion in DuckDB; every intermediate row is checked because
    // the rollup groups by recursion depth over the FULL walk
    // relation (trajectory, not just final states).
    "q299_recursive_cte" -> QuerySpec(
      (s, dir) => {
        // rank once, persist, and let every loop iteration join the
        // CACHED relation — the recursion then costs one hash join of
        // a shrinking frontier per round, never a recomputed window
        CacheScope.persist(Tables.orders(s, dir).select(
          col("o_custkey").as("ck"),
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_custkey")
              .orderBy("o_orderdate", "o_orderkey")).as("rn"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")))
          .createOrReplaceTempView("g_q299_ord")
        s.sql("""
          WITH RECURSIVE walk(ck, rn, cum) AS (
            SELECT ck, rn, cents FROM g_q299_ord WHERE rn = 1
            UNION ALL
            SELECT o.ck, o.rn, w.cum + o.cents
            FROM walk w JOIN g_q299_ord o
              ON o.ck = w.ck AND o.rn = w.rn + 1)
          SELECT CAST(rn AS BIGINT) AS depth,
                 CAST(count(*) AS BIGINT) AS n_chains,
                 CAST(sum(cum) AS BIGINT) AS cum_cents
          FROM walk GROUP BY rn ORDER BY depth""")
      },
      """WITH RECURSIVE ord AS (
           SELECT o_custkey AS ck,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS rn,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         walk(ck, rn, cum) AS (
           SELECT ck, rn, cents FROM ord WHERE rn = 1
           UNION ALL
           SELECT o.ck, o.rn, w.cum + o.cents
           FROM walk w JOIN ord o ON o.ck = w.ck AND o.rn = w.rn + 1)
         SELECT CAST(rn AS BIGINT) AS depth,
                CAST(count(*) AS BIGINT) AS n_chains,
                CAST(sum(cum) AS BIGINT) AS cum_cents
         FROM walk GROUP BY rn ORDER BY depth"""),

    // Q300: SQL pipe syntax (`|>`) — the Spark 4 linear-flow form of
    // the classic pricing summary: each pipe stage is exactly one
    // logical operator applied to the previous result, so the written
    // order IS the dataflow order. Catalyst plans it identically to
    // the nested form (same scan → filter → aggregate → sort), which
    // the classic-SQL DuckDB oracle certifies by value equality.
    "q300_pipe_syntax" -> QuerySpec(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("g_q300_lineitem")
        s.sql("""
          FROM g_q300_lineitem
          |> WHERE l_quantity >= 10
          |> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(cents) AS BIGINT) AS cents,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             GROUP BY l_returnflag, l_linestatus
          |> ORDER BY l_returnflag, l_linestatus""")
      },
      """SELECT l_returnflag, l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS cents,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem WHERE l_quantity >= 10
         GROUP BY 1, 2 ORDER BY 1, 2""")
  )
}
