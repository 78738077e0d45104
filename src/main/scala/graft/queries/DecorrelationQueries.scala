package graft.queries

import org.apache.spark.sql.functions._

import graft.{CacheScope, Tables}

/** Round-8 gates: the subquery-DECORRELATION surface (q140–q143) plus
  * runtime dynamic partition pruning (q144).
  *
  * TPC-H's hardest shapes are correlated subqueries — a scalar
  * aggregate per outer row (Q17), a HAVING-filtered IN (Q18), EXISTS /
  * NOT EXISTS against the same fact (Q21), and a global scalar
  * threshold plus an anti join (Q22). A row-at-a-time engine evaluates
  * these as nested loops (the reference's per-document Python loops are
  * the degenerate case); the scale-true plan DECORRELATES each into
  * pre-aggregates and semi/anti equi-joins so everything is one
  * hash-partitioned pass. These gates pin both the semantics (DuckDB
  * evaluates the definitional correlated form) and the plan shape (the
  * Spark side is written in the decorrelated form directly — no
  * subquery for the optimizer to get wrong).
  *
  * Determinism recipes as everywhere: money/quantity quantized to e2
  * BIGINT before any aggregate, fractional comparisons cross-multiplied
  * into integers (`qty < avg/5` ⇔ `5·qty·cnt < sum`), `div` on
  * nonnegative operands == DuckDB `//`, pinned ORDER BY with a unique
  * tie-break, every computed column aliased identically on both sides.
  */
object DecorrelationQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q140: TPC-H Q17 shape — "revenue lost to small orders": lines of
    // one brand whose quantity is below 20% of that part's average.
    // The correlated form computes avg(l_quantity) per outer row; the
    // decorrelated plan filters the fact to the brand's parts FIRST
    // (broadcast semi-join — the per-part average over brand lines
    // equals the correlated average because the subquery is keyed by
    // partkey), pre-aggregates (sum, count) per part, and broadcasts
    // the brand-part-sized aggregate back onto the same filtered fact.
    // The fractional threshold is cross-multiplied into integers:
    // qty < sum/(5·cnt) ⇔ 5·qty·cnt < sum — exact in BIGINT.
    // At 100 TB: the fact is never shuffled — one pushdown-filtered
    // scan feeds both the part-sized aggregate and the probe side.
    "q140_small_qty_revenue" -> QuerySpec(
      (s, dir) => {
        val brandParts = Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#4").select("p_partkey")
        val li = CacheScope.persist(
          Tables.lineitem(s, dir)
            .join(broadcast(brandParts),
              col("l_partkey") === col("p_partkey"), "left_semi")
            .select(col("l_partkey"),
              round(col("l_quantity") * 100).cast("long").as("qty_e2"),
              round(col("l_extendedprice") * 100).cast("long").as("price_e2")))
        val perPart = li.groupBy("l_partkey")
          .agg(sum("qty_e2").as("sq"), count(lit(1)).as("c"))
        li.join(broadcast(perPart), Seq("l_partkey"))
          .filter(lit(5) * col("qty_e2") * col("c") < col("sq"))
          .agg(sum(col("price_e2")).as("sp"), count(lit(1)).as("n_lines"))
          .select(expr("sp div 7").as("avg_weekly_e2"), col("n_lines"))
      },
      """WITH li AS (SELECT l_partkey, CAST(round(l_quantity*100) AS BIGINT) AS qty_e2,
                            CAST(round(l_extendedprice*100) AS BIGINT) AS price_e2
                     FROM lineitem
                     WHERE l_partkey IN (SELECT p_partkey FROM part
                                         WHERE p_brand = 'Brand#4'))
         SELECT CAST(sum(li.price_e2) // 7 AS BIGINT) AS avg_weekly_e2,
                CAST(count(*) AS BIGINT) AS n_lines
         FROM li
         WHERE 5 * li.qty_e2 * (SELECT count(*) FROM li i WHERE i.l_partkey = li.l_partkey)
               < (SELECT sum(i.qty_e2) FROM li i WHERE i.l_partkey = li.l_partkey)"""),

    // Q141: TPC-H Q18 shape — large-volume orders: customers whose
    // order carries > 300 total quantity. The correlated form is
    // `o_orderkey IN (SELECT l_orderkey … HAVING sum > T)`; the
    // decorrelated plan pre-aggregates lineitem by orderkey with the
    // HAVING applied map-side-combined, then inner-joins the tiny
    // survivor set to orders and customer (survivors ≪ orders, so the
    // two joins shuffle only the qualifying keys at 100 TB — never the
    // full fact against the full fact). Top-100 by a unique-key
    // tie-broken sort keeps the LIMIT deterministic.
    "q141_large_volume_orders" -> QuerySpec(
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_e2"))
          .filter(col("sum_qty_e2") > 30000L)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(big, o("o_orderkey") === big("l_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
              .as("odays"),
            round(col("o_totalprice") * 100).cast("long").as("totalprice_e2"),
            col("sum_qty_e2"))
          .orderBy(desc("totalprice_e2"), asc("o_orderkey"))
          .limit(100)
      },
      """SELECT c.c_name, c.c_custkey, o.o_orderkey,
                CAST(epoch_us(o.o_orderdate) AS BIGINT) // 86400000000 AS odays,
                CAST(round(o.o_totalprice*100) AS BIGINT) AS totalprice_e2,
                big.sum_qty_e2
         FROM orders o
         JOIN (SELECT l_orderkey,
                      CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
                        AS sum_qty_e2
               FROM lineitem GROUP BY 1
               HAVING sum(CAST(round(l_quantity*100) AS BIGINT)) > 30000)
              big ON o.o_orderkey = big.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         ORDER BY totalprice_e2 DESC, o.o_orderkey LIMIT 100"""),

    // Q142: TPC-H Q21 shape — suppliers who kept orders waiting: on a
    // finalized ('F') order, a supplier's line shipped > 60 days after
    // the order date, at least one OTHER supplier contributed a line
    // (EXISTS), and NO other supplier was also late (NOT EXISTS — this
    // supplier alone is to blame). Both correlated subqueries
    // decorrelate into self equi-joins on l_orderkey: a left-semi
    // against the full fact and a left-anti against the late relation
    // itself (the subqueries share the outer row's order, so order
    // status carries over for free). The late relation feeds both
    // probes, so it is persisted once; per-order fan-out is bounded by
    // lines-per-order, never all-pairs. Fixture has no
    // l_commitdate/l_receiptdate, so lateness is shipdate vs orderdate.
    "q142_waiting_suppliers" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_suppkey", "l_shipdate")
        val fOrders = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val late = CacheScope.persist(
          li.join(fOrders, col("l_orderkey") === col("o_orderkey"))
            .filter(col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .select(col("l_orderkey"), col("l_suppkey")))
        val others = li.select(col("l_orderkey").as("ok2"),
          col("l_suppkey").as("sk2"))
        val lateOthers = late.select(col("l_orderkey").as("ok3"),
          col("l_suppkey").as("sk3"))
        val sole = late
          .join(others, col("l_orderkey") === col("ok2")
            && col("l_suppkey") =!= col("sk2"), "left_semi")
          .join(lateOthers, col("l_orderkey") === col("ok3")
            && col("l_suppkey") =!= col("sk3"), "left_anti")
        sole.join(Tables.supplier(s, dir),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name"))
      },
      """WITH l1 AS (SELECT l.l_orderkey, l.l_suppkey
                     FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                     WHERE o.o_orderstatus = 'F'
                       AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
         WHERE EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM l1 l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey)
         GROUP BY s.s_name ORDER BY numwait DESC, s_name"""),

    // Q143: TPC-H Q22 shape — dormant high-balance customers: balance
    // above the average positive balance (global scalar subquery) and
    // no order since 2001 (NOT EXISTS). The scalar decorrelates into a
    // one-row (sum, cnt) aggregate broadcast onto every customer (the
    // threshold compares integrally: bal·n > s); the NOT EXISTS into a
    // left-anti join against the date-filtered orders projection.
    // Per-nation rollup, pure BIGINT. At 100 TB the anti join is one
    // key shuffle of (custkey) pairs — the date filter reaches the
    // orders scan first.
    "q143_dormant_rich_customers" -> QuerySpec(
      (s, dir) => {
        val cust = Tables.customer(s, dir).select(
          col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_e2"))
        val avgp = cust.filter(col("bal_e2") > 0)
          .agg(sum("bal_e2").as("s"), count(lit(1)).as("n"))
        val recent = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(avgp))
          .filter(col("bal_e2") * col("n") > col("s"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast("long").as("cntry"))
          .agg(count(lit(1)).as("numcust"), sum("bal_e2").as("totbal_e2"))
          .orderBy("cntry")
      },
      """WITH cust AS (SELECT c_custkey, c_nationkey,
                              CAST(round(c_acctbal*100) AS BIGINT) AS bal_e2
                       FROM customer),
              avgp AS (SELECT CAST(sum(bal_e2) AS BIGINT) AS s,
                              CAST(count(*) AS BIGINT) AS n
                       FROM cust WHERE bal_e2 > 0)
         SELECT CAST(c.c_nationkey AS BIGINT) AS cntry,
                CAST(count(*) AS BIGINT) AS numcust,
                CAST(sum(c.bal_e2) AS BIGINT) AS totbal_e2
         FROM cust c CROSS JOIN avgp
         WHERE c.bal_e2 * avgp.n > avgp.s
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2001-01-01')
         GROUP BY 1 ORDER BY 1"""),

    // Q144: dynamic partition pruning — the RUNTIME companion to
    // q134's planning-time pruning. The fact is written partitioned by
    // order year; the dim (years whose URGENT share exceeds 1/5) is an
    // AGGREGATE of the base table, so no static constraint can reach
    // the fact side — the partition filter exists only at runtime,
    // after the broadcast dim materializes. Spark then prunes the
    // fact's partition directories via the reused broadcast
    // (`dynamicpruningexpression` in the scan's PartitionFilters —
    // asserted by ScaleTechniquesSpec). At 100 TB this is the
    // difference between scanning 7 years and scanning the 3 the dim
    // selects, decided per run by data, not by a literal in the query.
    "q144_dynamic_pruning" -> QuerySpec(
      (s, dir) => {
        val tmp = GateTmp.dir("graft-q144").toString + "/orders_by_year"
        Tables.orders(s, dir)
          .withColumn("o_year", year(col("o_orderdate")))
          .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
        val fact = s.read.parquet(tmp)
        val dim = Tables.orders(s, dir)
          .groupBy(year(col("o_orderdate")).as("d_year"))
          .agg(count(lit(1)).as("yr_n"),
            count(when(col("o_orderpriority") === "1-URGENT", 1)).as("yr_u"))
          .filter(col("yr_u") * 5 > col("yr_n"))
          .select("d_year")
        fact.join(broadcast(dim), fact("o_year") === dim("d_year"))
          .groupBy(fact("o_year").cast("long").as("o_year"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("rev_e2"))
          .orderBy("o_year")
      },
      """WITH dim AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS d_year
                      FROM orders GROUP BY 1
                      HAVING count(*) FILTER (WHERE o_orderpriority = '1-URGENT') * 5
                             > count(*))
         SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_e2
         FROM orders o JOIN dim ON CAST(year(o.o_orderdate) AS BIGINT) = dim.d_year
         GROUP BY 1 ORDER BY 1""")
  )
}
