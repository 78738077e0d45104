package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{CacheScope, Tables}

/** Round-8 gates: the remaining hard TPC-H JOIN SHAPES (q151–q157) and
  * deterministic training-mixture sampling (q158).
  *
  * The decorrelation gates (q140–q144) covered correlated scalar /
  * EXISTS subqueries; this band covers the join-planning shapes that
  * separate a plan that survives 100 TB from one that doesn't:
  * argmin-per-group join-back (Q2), conditional-share multi-joins (Q8),
  * multi-dim profit rollups (Q9), max-of-aggregate with ties (Q15),
  * distinct-count with exclusion (Q16), disjunctive pushdown (Q19), and
  * fraction-of-total semi-join chains (Q20). Each Spark side is written
  * in the decorrelated, broadcast-annotated form; each oracle evaluates
  * the definitional (often correlated) SQL in DuckDB.
  *
  * Determinism recipes as throughout the tree: money/quantity quantized
  * to e2 BIGINT before any aggregate (products of two e2 terms are e4),
  * fractions cross-multiplied into integer predicates, `div` only on
  * nonnegative operands (== DuckDB `//`), every computed column aliased
  * identically on both sides, and a pinned ORDER BY with a unique
  * tie-break.
  */
object JoinShapeQueries {

  /** e4 revenue term shared by several gates:
    * `round(price·100) · (100 − round(discount·100))` — exact in BIGINT,
    * identical expression in the oracles.
    */
  private def revTermE4 = round(col("l_extendedprice") * 100).cast("long") *
    (lit(100L) - round(col("l_discount") * 100).cast("long"))

  private val revTermSql =
    """CAST(round(l_extendedprice*100) AS BIGINT)
       * (100 - CAST(round(l_discount*100) AS BIGINT))"""

  val specs: Map[String, QuerySpec] = Map(

    // Q151: TPC-H Q2 shape — cheapest supplier per part (argmin
    // decorrelation). The correlated form re-evaluates min(price) per
    // outer row; the scale-true plan computes the per-part min ONCE
    // (map-side-combined aggregate over the semi-filtered fact), then
    // broadcast-joins it back onto the same filtered fact to select the
    // achieving rows, with min(suppkey) as the deterministic tie-break.
    // The fact is semi-filtered to the 38 size-1 parts FIRST, so at
    // 100 TB both the aggregate and the probe read one pushdown-pruned
    // scan (persisted: it feeds both sides).
    "q151_cheapest_supplier" -> QuerySpec(
      (s, dir) => {
        val parts = Tables.part(s, dir).filter(col("p_size") === 1)
          .select("p_partkey", "p_name")
        val li = CacheScope.persist(
          Tables.lineitem(s, dir)
            .join(broadcast(parts.select("p_partkey")),
              col("l_partkey") === col("p_partkey"), "left_semi")
            .select(col("l_partkey"), col("l_suppkey"),
              round(col("l_extendedprice") * 100).cast("long").as("price_e2")))
        val minP = li.groupBy("l_partkey")
          .agg(min("price_e2").as("min_price_e2"))
        val chosen = li.join(broadcast(minP), Seq("l_partkey"))
          .filter(col("price_e2") === col("min_price_e2"))
          .groupBy("l_partkey", "min_price_e2")
          .agg(min("l_suppkey").as("s_suppkey"))
        chosen
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
            Seq("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("min_price_e2"),
            col("s_suppkey"), col("s_name"))
          .orderBy("p_partkey")
      },
      """WITH li AS (SELECT l_partkey, l_suppkey,
                            CAST(round(l_extendedprice*100) AS BIGINT) AS price_e2
                     FROM lineitem
                     WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)),
              ch AS (SELECT p.p_partkey, p.p_name, l.price_e2 AS min_price_e2,
                            min(l.l_suppkey) AS s_suppkey
                     FROM part p JOIN li l ON l.l_partkey = p.p_partkey
                     WHERE l.price_e2 = (SELECT min(l2.price_e2) FROM li l2
                                         WHERE l2.l_partkey = l.l_partkey)
                     GROUP BY 1, 2, 3)
         SELECT ch.p_partkey, ch.p_name, ch.min_price_e2, ch.s_suppkey, s.s_name
         FROM ch JOIN supplier s ON s.s_suppkey = ch.s_suppkey
         ORDER BY p_partkey"""),

    // Q152: TPC-H Q8 shape — market share: of all ECONOMY-part revenue
    // sold to ASIA customers, the fraction supplied from NATION_7, per
    // order year. One fact pass: the conditional numerator rides the
    // same aggregate as the denominator (sum of CASE — no second scan,
    // no self-join), and every dimension (customer→nation→region,
    // part, supplier→nation) broadcasts. share_e6 = num·10⁶ div den —
    // integer on nonnegative operands, identical in DuckDB.
    "q152_market_share" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            revTermE4.as("rev_e4"))
        val asiaCust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
          .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir)
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("cust_nk"))),
            col("c_nationkey") === col("cust_nk"))
          .select("c_custkey")
        val econParts = Tables.part(s, dir)
          .filter(col("p_type") === "ECONOMY").select("p_partkey")
        val suppNation = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("supp_nk"),
              col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("supp_nk"))
          .select("s_suppkey", "supp_nation")
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        // §2.2 shuffle fewer bytes: the ECONOMY-part and supplier
        // broadcasts apply BEFORE the lineitem⋈orders sort-merge join,
        // so the fact rows the p_type filter drops (~4/5) never enter
        // the big shuffle. Inner joins commute — identical result, same
        // aggregate; the orders side is unchanged.
        li.join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(asiaCust, col("o_custkey") === col("c_custkey"))
          .groupBy("o_year")
          .agg(
            sum(when(col("supp_nation") === "NATION_7", col("rev_e4"))
              .otherwise(0L)).as("num_e4"),
            sum(col("rev_e4")).as("den_e4"))
          .select(col("o_year"), col("num_e4"), col("den_e4"),
            expr("(num_e4 * 1000000L) div den_e4").as("share_e6"))
          .orderBy("o_year")
      },
      s"""WITH base AS (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   n2.n_name AS supp_nation, $revTermSql AS rev_e4
            FROM lineitem l
                 JOIN orders o ON l.l_orderkey = o.o_orderkey
                 JOIN customer c ON o.o_custkey = c.c_custkey
                 JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
                 JOIN region r ON n1.n_regionkey = r.r_regionkey
                 JOIN part p ON l.l_partkey = p.p_partkey
                 JOIN supplier s ON l.l_suppkey = s.s_suppkey
                 JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'),
           agg AS (
            SELECT o_year,
                   CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_e4
                                 ELSE 0 END) AS BIGINT) AS num_e4,
                   CAST(sum(rev_e4) AS BIGINT) AS den_e4
            FROM base GROUP BY 1)
         SELECT o_year, num_e4, den_e4, (num_e4 * 1000000) // den_e4 AS share_e6
         FROM agg ORDER BY o_year"""),

    // Q153: TPC-H Q9 shape — profit by supplier nation and year over
    // name-matched parts. Profit per line = revenue term − cost term
    // (retail price × quantity as the supply-cost stand-in; both e4
    // BIGINT, difference may be negative — exact). The p_name LIKE
    // filter lands on the 2000-row part dim, which then SEMI-bounds the
    // fact via the broadcast join; supplier/nation/orders dims all
    // broadcast, so the only fact shuffle is the final (nation, year)
    // rollup.
    "q153_product_profit" -> QuerySpec(
      (s, dir) => {
        val gearParts = Tables.part(s, dir)
          .filter(col("p_name").like("%gear%"))
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100).cast("long").as("retail_e2"))
        val suppNation = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        Tables.lineitem(s, dir)
          .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("supp_nation"), col("o_year"),
            (revTermE4 - col("retail_e2")
              * round(col("l_quantity") * 100).cast("long")).as("amount_e4"))
          .groupBy("supp_nation", "o_year")
          .agg(sum("amount_e4").as("profit_e4"))
          .orderBy("supp_nation", "o_year")
      },
      s"""SELECT n.n_name AS supp_nation,
                 CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(sum($revTermSql
                          - CAST(round(p.p_retailprice*100) AS BIGINT)
                            * CAST(round(l.l_quantity*100) AS BIGINT))
                      AS BIGINT) AS profit_e4
          FROM lineitem l
               JOIN part p ON p.p_partkey = l.l_partkey
               JOIN supplier s ON s.s_suppkey = l.l_suppkey
               JOIN nation n ON n.n_nationkey = s.s_nationkey
               JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE p.p_name LIKE '%gear%'
          GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q154: TPC-H Q15 shape — top supplier(s) by revenue in a quarter.
    // The max-of-aggregate scalar decorrelates into a one-row broadcast
    // joined back onto the per-supplier aggregate — ties surface as
    // multiple rows (deterministic, no LIMIT 1 arbitrariness), exactly
    // the correlated `total = (SELECT max(total))` semantics. The date
    // window pushes to the scan; the aggregate is one supplier-key
    // shuffle with map-side combine.
    "q154_top_supplier" -> QuerySpec(
      (s, dir) => {
        val rev = CacheScope.persist(
          Tables.lineitem(s, dir)
            .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01"))
              && col("l_shipdate") < to_timestamp(lit("1997-04-01")))
            .groupBy("l_suppkey")
            .agg(sum(revTermE4).as("total_e4")))
        val top = rev.agg(max("total_e4").as("max_e4"))
        rev.crossJoin(broadcast(top))
          .filter(col("total_e4") === col("max_e4"))
          .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_e4"))
          .orderBy("s_suppkey")
      },
      s"""WITH rev AS (SELECT l_suppkey, CAST(sum($revTermSql) AS BIGINT) AS total_e4
                       FROM lineitem
                       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                         AND l_shipdate < TIMESTAMP '1997-04-01'
                       GROUP BY 1)
         SELECT s.s_suppkey, s.s_name, r.total_e4
         FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
         WHERE r.total_e4 = (SELECT max(total_e4) FROM rev)
         ORDER BY s_suppkey"""),

    // Q155: TPC-H Q16 shape — how many distinct suppliers serve each
    // (brand, size) bucket, excluding flagged suppliers (negative
    // balance as the complaints stand-in). COUNT(DISTINCT supplier)
    // expands to Spark's two-phase distinct aggregate: partial
    // per-(brand,size,supp) dedup map-side, then the count — never a
    // full-row shuffle of the fact. The exclusion is a broadcast
    // anti-join (6 suppliers), the part filter broadcasts.
    "q155_supplier_counts" -> QuerySpec(
      (s, dir) => {
        val parts = Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#1"
            && col("p_size").isin(1, 5, 10, 15, 20, 25))
          .select("p_partkey", "p_brand", "p_size")
        val flagged = Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy("p_brand", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_size"))
      },
      """SELECT p.p_brand, p.p_size,
                CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
         FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
         WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 10, 15, 20, 25)
           AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                   WHERE s_acctbal < 0)
         GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size"""),

    // Q156: TPC-H Q19 shape — revenue under an OR-of-ANDs predicate
    // mixing part attributes (brand, size) and line attributes
    // (quantity band). The disjunction spans the join, so no single
    // conjunct can cross it — the scale-true form adds the HAND-DERIVED
    // per-side unions explicitly: part scans only rows matching ANY
    // branch's (brand, size), lineitem scans only rows in ANY branch's
    // quantity band (both reach PushedFilters as Or chains —
    // plan-asserted in JoinShapeSpec), and the exact branch pairing
    // evaluates once post-join in the same codegen stage. Relying on
    // the optimizer to infer these (CNF extraction) is
    // version-dependent; deriving them by hand is free and guaranteed.
    "q156_disjunctive_pushdown" -> QuerySpec(
      (s, dir) => {
        val b1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
        val b2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
        val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
        val q1 = col("l_quantity").between(1, 11)
        val q2 = col("l_quantity").between(10, 20)
        val q3 = col("l_quantity").between(20, 30)
        val parts = Tables.part(s, dir)
          .filter(b1 || b2 || b3) // derived part-side union → PushedFilters
          .select("p_partkey", "p_brand", "p_size")
        val li = Tables.lineitem(s, dir)
          .filter(q1 || q2 || q3) // derived line-side union → PushedFilters
          .select(col("l_partkey"), col("l_quantity"), revTermE4.as("rev_e4"))
        li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .filter((b1 && q1) || (b2 && q2) || (b3 && q3))
          .agg(count(lit(1)).as("n_lines"), sum(col("rev_e4")).as("rev_e4"))
      },
      s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum($revTermSql) AS BIGINT) AS rev_e4
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
                 AND l.l_quantity BETWEEN 1 AND 11)
             OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
                 AND l.l_quantity BETWEEN 10 AND 20)
             OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                 AND l.l_quantity BETWEEN 20 AND 30)"""),

    // Q157: TPC-H Q20 shape — suppliers (in two nations) who dominate
    // supply of some 'red' part: their shipped quantity exceeds 10% of
    // that part's total. The correlated fraction-of-total decorrelates
    // into a per-(part,supp) aggregate joined to a per-part rollup OF
    // THAT AGGREGATE (not a second fact scan — persisted once), the
    // fraction cross-multiplied to `10·sq > tot`; qualifying suppkeys
    // then LEFT-SEMI the supplier dim. The fact is read exactly once,
    // semi-bounded by the broadcast red-part filter.
    "q157_dominant_suppliers" -> QuerySpec(
      (s, dir) => {
        val redParts = Tables.part(s, dir)
          .filter(col("p_name").like("red %")).select("p_partkey")
        val ps = CacheScope.persist(
          Tables.lineitem(s, dir)
            .join(broadcast(redParts),
              col("l_partkey") === col("p_partkey"), "left_semi")
            .groupBy("l_partkey", "l_suppkey")
            .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sq")))
        val tot = ps.groupBy(col("l_partkey").as("tk"))
          .agg(sum("sq").as("tot"))
        val qualifying = ps.join(tot, col("l_partkey") === col("tk"))
          .filter(lit(10L) * col("sq") > col("tot"))
          .select("l_suppkey")
        val nations = Tables.nation(s, dir)
          .filter(col("n_name").isin("NATION_3", "NATION_8"))
          .select("n_nationkey")
        Tables.supplier(s, dir)
          .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"),
            "left_semi")
          .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      """WITH li AS (SELECT l_partkey, l_suppkey,
                            CAST(round(l_quantity*100) AS BIGINT) AS q
                     FROM lineitem
                     WHERE l_partkey IN (SELECT p_partkey FROM part
                                         WHERE p_name LIKE 'red %')),
              ps AS (SELECT l_partkey, l_suppkey, CAST(sum(q) AS BIGINT) AS sq
                     FROM li GROUP BY 1, 2)
         SELECT s.s_suppkey, s.s_name
         FROM supplier s
              JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_name IN ('NATION_3', 'NATION_8')
           AND s.s_suppkey IN (
             SELECT l_suppkey FROM ps
             WHERE 10 * ps.sq > (SELECT CAST(sum(q) AS BIGINT) FROM li l2
                                 WHERE l2.l_partkey = ps.l_partkey))
         ORDER BY s_suppkey"""),

    // Q158: deterministic training-mixture sampling — cap each source
    // at a token budget, choosing documents by content-stable hash
    // order (md5 of the id: reproducible across runs, machines, and
    // corpus growth — early docs stay chosen when new docs arrive,
    // unlike random sampling or arrival order). Per source: rank by
    // (md5, id), running token sum via a window, keep while cum ≤
    // budget. One shuffle on source; per-group window state is O(1).
    // At 100 TB with few sources, salt the rank computation per hash
    // prefix and pre-aggregate prefix token totals to find the cutoff
    // without a single-reducer sort — the gate pins the SEMANTICS that
    // optimization must preserve. Tokens = n_chars div 4 (the
    // chars-per-token heuristic; swap in real tokenizer counts via
    // q28's operator when available).
    "q158_mixture_budget" -> QuerySpec(
      (s, dir) => {
        val w = Window.partitionBy("source")
          .orderBy(col("pri"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            expr("n_chars div 4").as("toks"),
            md5(col("doc_id").cast("string")).as("pri"))
          .withColumn("cum", sum(col("toks")).over(w))
          .filter(col("cum") <= 1000L)
          .groupBy("source")
          .agg(count(lit(1)).as("kept_docs"), sum("toks").as("kept_tokens"))
          .orderBy("source")
      },
      """WITH ranked AS (
           SELECT source, doc_id, n_chars // 4 AS toks,
                  sum(n_chars // 4) OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
                CAST(sum(toks) AS BIGINT) AS kept_tokens
         FROM ranked WHERE cum <= 1000
         GROUP BY 1 ORDER BY source""")
  )
}
