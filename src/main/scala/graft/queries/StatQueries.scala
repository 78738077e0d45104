package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 statistics / experimentation surface: the hypothesis-test,
  * sampling, and view-maintenance operators a training-data platform
  * runs ON TOP of the raw pipeline — split assignment, drift tests,
  * association mining, incremental view maintenance.
  *
  * Design rule shared by every gate here: any statistic that would
  * naively be a floating-point fold (chi-squared, rank sums, OLS
  * coefficients, lift) is computed in EXACT integer arithmetic —
  * rationals scaled to ppm with truncating division (`div`, identical
  * to DuckDB's `//` toward-zero semantics, verified both engines) —
  * so results are bit-stable under any partitioning / visit order.
  * A double fold would make the answer depend on partition count,
  * which is exactly what a 1000-executor re-run must not do.
  */
object StatQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q179: deterministic train/val/test split assignment — the
    // content-stable 80/10/10 hash split every training pipeline needs.
    // split(doc) = md5(doc_id) mod 100 (native codegen'd Md5Prefix60),
    // so assignment is a pure map: no shuffle, no RNG state, stable
    // under re-runs, re-partitioning, and incremental appends (a new
    // doc never moves an old doc's split — the property
    // sample()/rand(seed) cannot give, since those depend on partition
    // layout). The verification agg is one map-side-combined shuffle.
    "q179_hash_split" -> QuerySpec(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("b",
            expr("md5_prefix60(CAST(doc_id AS STRING)) % 100"))
          .withColumn("split",
            when(col("b") < 80, "train")
              .when(col("b") < 90, "val")
              .otherwise("test"))
        d.groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"))
          .orderBy("lang", "split")
      },
      """WITH h AS (SELECT lang, n_chars,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % 100 AS b
                    FROM documents)
         SELECT lang,
                CASE WHEN b < 80 THEN 'train'
                     WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM h GROUP BY 1, 2 ORDER BY lang, split"""),

    // Q180: chi-squared independence test (lang x source contingency)
    // in EXACT integer ppm. Per cell (o - e)^2/e with e = r*c/n
    // rewrites rationally to (o*n - r*c)^2 / (n*r*c); each cell's term
    // is floored to ppm and summed — including the zero-observed cells
    // the full r x c grid implies (a sum over observed cells only
    // understates chi2). Plan: one count aggregate over the fact, then
    // a cells-sized (langs x sources) broadcast cross grid — the fact
    // is scanned once; the statistic is assembled from aggregates.
    "q180_chi2_independence" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q180_documents")
        s.sql("""
          WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                     FROM g_q180_documents GROUP BY 1, 2),
          r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
          c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
          n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
          grid AS (SELECT r.lang, c.source, r.r, c.c, n.n,
                          COALESCE(o.o, CAST(0 AS BIGINT)) AS o
                   FROM r CROSS JOIN c CROSS JOIN n
                   LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
          cell AS (SELECT n,
                          (CAST(o*n - r*c AS DECIMAL(38,0))
                           * CAST(o*n - r*c AS DECIMAL(38,0))
                           * 1000000) div (n*r*c) AS t
                   FROM grid)
          SELECT CAST(sum(t) AS BIGINT) AS chi2_ppm,
                 CAST((SELECT count(*) - 1 FROM r)
                      * (SELECT count(*) - 1 FROM c) AS BIGINT) AS dof,
                 CAST(max(n) AS BIGINT) AS n
          FROM cell""")
      },
      """WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                    FROM documents GROUP BY 1, 2),
         r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
         c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
         n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
         grid AS (SELECT r.lang, c.source, r.r, c.c, n.n,
                         COALESCE(o.o, CAST(0 AS BIGINT)) AS o
                  FROM r CROSS JOIN c CROSS JOIN n
                  LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
         cell AS (SELECT n,
                         (CAST(o*n - r*c AS HUGEINT)
                          * CAST(o*n - r*c AS HUGEINT)
                          * 1000000) // (CAST(n AS HUGEINT)*r*c) AS t
                  FROM grid)
         SELECT CAST(sum(t) AS BIGINT) AS chi2_ppm,
                CAST((SELECT count(*) - 1 FROM r)
                     * (SELECT count(*) - 1 FROM c) AS BIGINT) AS dof,
                CAST(max(n) AS BIGINT) AS n
         FROM cell"""),

    // Q181: Mann-Whitney rank-sum drift test (click vs purchase event
    // values) — the nonparametric two-sample test that catches
    // distribution shift the mean misses, and the tie-robust companion
    // to the KS gate (q122). Ranks stay exact integers: with rmin =
    // min rank of a value and tc its tie count, 2*avg_rank = 2*rmin +
    // tc - 1, so the doubled rank sum R2 and U-statistic 2U = R2 -
    // n(n+1) are integer-exact under any tie structure. Plan: one
    // global sort (rank needs it), tie counts by a value-partitioned
    // window on the same sorted exchange, then a two-row aggregate.
    "q181_mann_whitney" -> QuerySpec(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("g_q181_events")
        s.sql("""
          WITH sample AS (SELECT event_type AS grp, value
                          FROM g_q181_events
                          WHERE event_type IN ('click', 'purchase')),
          ranked AS (SELECT grp,
                            rank() OVER (ORDER BY value) AS rmin,
                            count(*) OVER (PARTITION BY value) AS tc
                     FROM sample),
          agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(2*rmin + tc - 1) AS BIGINT) AS r2
                  FROM ranked GROUP BY 1)
          SELECT grp, n, r2 - n*(n+1) AS u2
          FROM agg ORDER BY grp""")
      },
      """WITH sample AS (SELECT event_type AS grp, value
                         FROM events
                         WHERE event_type IN ('click', 'purchase')),
         ranked AS (SELECT grp,
                           rank() OVER (ORDER BY value) AS rmin,
                           count(*) OVER (PARTITION BY value) AS tc
                    FROM sample),
         agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(2*rmin + tc - 1) AS BIGINT) AS r2
                 FROM ranked GROUP BY 1)
         SELECT grp, n, r2 - n*(n+1) AS u2
         FROM agg ORDER BY grp"""),

    // Q182: grouped OLS regression (n_chars on whitespace token count,
    // per language) from sufficient statistics — slope, intercept, and
    // R^2 in exact integer ppm. One map-side-combined aggregate
    // collects (n, Sx, Sy, Sxy, Sxx, Syy); the closed-form
    // slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) is a ratio of exact
    // integers, floored to ppm; intercept and R^2 derive the same way
    // (R^2's num^2 term routed through DECIMAL(38,0) — it exceeds
    // int64). No per-row residual pass, no iterative solver: at 100 TB
    // this is one scan and a groups-sized result.
    "q182_ols_groups" -> QuerySpec(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("g_q182_documents")
        s.sql("""
          WITH xy AS (SELECT lang,
                             CAST(size(split(text, ' ')) AS BIGINT) AS x,
                             CAST(n_chars AS BIGINT) AS y
                      FROM g_q182_documents),
          m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x*y) AS BIGINT) AS sxy,
                       CAST(sum(x*x) AS BIGINT) AS sxx,
                       CAST(sum(y*y) AS BIGINT) AS syy
                FROM xy GROUP BY 1),
          d AS (SELECT lang, n, sx, sy,
                       n*sxy - sx*sy AS num,
                       n*sxx - sx*sx AS den,
                       n*syy - sy*sy AS deny
                FROM m)
          SELECT lang, n,
                 (num * 1000000) div den AS slope_ppm,
                 (sy*1000000 - ((num * 1000000) div den) * sx) div n
                   AS intercept_ppm,
                 (CAST(num AS DECIMAL(38,0)) * CAST(num AS DECIMAL(38,0))
                  * 1000000)
                   div (CAST(den AS DECIMAL(38,0)) * CAST(deny AS DECIMAL(38,0)))
                   AS r2_ppm
          FROM d ORDER BY lang""")
      },
      """WITH xy AS (SELECT lang,
                            CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                            CAST(n_chars AS BIGINT) AS y
                     FROM documents),
         m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*y) AS BIGINT) AS sxy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(y*y) AS BIGINT) AS syy
               FROM xy GROUP BY 1),
         d AS (SELECT lang, n, sx, sy,
                      n*sxy - sx*sy AS num,
                      n*sxx - sx*sx AS den,
                      n*syy - sy*sy AS deny
               FROM m)
         SELECT lang, n,
                (num * 1000000) // den AS slope_ppm,
                (sy*1000000 - ((num * 1000000) // den) * sx) // n
                  AS intercept_ppm,
                CAST((CAST(num AS HUGEINT) * CAST(num AS HUGEINT) * 1000000)
                     // (CAST(den AS HUGEINT) * CAST(deny AS HUGEINT))
                     AS BIGINT) AS r2_ppm
         FROM d ORDER BY lang"""),

    // Q183: incremental view maintenance for a JOIN view (delta rules)
    // — the per-nation revenue view M = orders |X| customer maintained
    // under simultaneous inserts on BOTH sides. New state =
    // old partials + [dA |X| B0  UNION  A0 |X| dB  UNION  dA |X| dB]
    // aggregated — the classic delta-join identity. The base
    // contribution is kept as per-nation (count, cents) PARTIALS and
    // never recomputed; only delta-sized joins run at refresh, so a
    // 1 GB batch against a 100 TB view costs O(delta join) + a
    // groups-sized merge, not a view rebuild. The oracle recomputes
    // the full join from scratch — the identity the maintenance must
    // reproduce exactly.
    "q183_ivm_delta_join" -> QuerySpec(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val oBase = o.filter(col("o_orderkey") % 10 =!= 0)
        val oDelta = o.filter(col("o_orderkey") % 10 === 0)
        val cBase = c.filter(col("c_custkey") % 13 =!= 0)
        val cDelta = c.filter(col("c_custkey") % 13 === 0)
        def joined(a: DataFrame, b: DataFrame): DataFrame =
          a.join(b, a("o_custkey") === b("c_custkey"))
            .select(b("c_nationkey"), a("cents"))
        def partials(df: DataFrame): DataFrame =
          df.groupBy("c_nationkey")
            .agg(count(lit(1)).as("pn"), sum("cents").as("pc"))
        // the standing view state: per-nation partials of A0 |X| B0
        val viewState = partials(joined(oBase, cBase))
        // refresh: three delta-sized joins, aggregated once
        val deltaState = partials(
          joined(oDelta, cBase)
            .unionByName(joined(oBase, cDelta))
            .unionByName(joined(oDelta, cDelta)))
        viewState.unionByName(deltaState)
          .groupBy("c_nationkey")
          .agg(sum("pn").as("n_orders"), sum("pc").as("revenue_e2"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("n_orders"), col("revenue_e2"))
          .orderBy("n_name")
      },
      """SELECT n.n_name,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
                  AS revenue_e2
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1 ORDER BY n_name"""),

    // Q184: market-basket association mining — brand pairs co-bought
    // in one order, with support and lift in exact ppm. The pair
    // generator is a SELF-JOIN ON THE ORDER KEY over the distinct
    // (order, brand) relation, so fan-out is C(basket,2) per order —
    // bounded by basket size (<= 13 lines here), never all-pairs over
    // the catalog. Lift = P(ab)/(P(a)P(b)) rewrites to the integer
    // ratio (n_ab * n_orders * 1e6) div (n_a * n_b). Top-20 by
    // support with a total tiebreak.
    "q184_basket_lift" -> QuerySpec(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("g_q184_lineitem")
        Tables.part(s, dir).createOrReplaceTempView("g_q184_part")
        s.sql("""
          WITH basket AS (SELECT DISTINCT l.l_orderkey, p.p_brand
                          FROM g_q184_lineitem l
                          JOIN g_q184_part p ON l.l_partkey = p.p_partkey),
          n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
                FROM basket),
          singles AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_1
                      FROM basket GROUP BY 1),
          pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                           CAST(count(*) AS BIGINT) AS support
                    FROM basket a
                    JOIN basket b ON a.l_orderkey = b.l_orderkey
                                 AND a.p_brand < b.p_brand
                    GROUP BY 1, 2)
          SELECT p.brand_a, p.brand_b, p.support,
                 (p.support * n.n_orders * 1000000)
                   div (sa.n_1 * sb.n_1) AS lift_ppm
          FROM pairs p
          JOIN singles sa ON sa.p_brand = p.brand_a
          JOIN singles sb ON sb.p_brand = p.brand_b
          CROSS JOIN n
          ORDER BY p.support DESC, p.brand_a, p.brand_b
          LIMIT 20""")
      },
      """WITH basket AS (SELECT DISTINCT l.l_orderkey, p.p_brand
                         FROM lineitem l
                         JOIN part p ON l.l_partkey = p.p_partkey),
         n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
               FROM basket),
         singles AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_1
                     FROM basket GROUP BY 1),
         pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                          CAST(count(*) AS BIGINT) AS support
                   FROM basket a
                   JOIN basket b ON a.l_orderkey = b.l_orderkey
                                AND a.p_brand < b.p_brand
                   GROUP BY 1, 2)
         SELECT p.brand_a, p.brand_b, p.support,
                (p.support * n.n_orders * 1000000)
                  // (sa.n_1 * sb.n_1) AS lift_ppm
         FROM pairs p
         JOIN singles sa ON sa.p_brand = p.brand_a
         JOIN singles sb ON sb.p_brand = p.brand_b
         CROSS JOIN n
         ORDER BY p.support DESC, p.brand_a, p.brand_b
         LIMIT 20"""),

    // Q185: weighted sampling without replacement (Efraimidis-Spirakis
    // exponential-rank), per language, k = 5, weight = n_chars — but
    // DERANDOMIZED: the uniform draw is u = (md5(doc_id)+1)/2^60 from
    // the native content hash, so the "random" sample is a pure
    // function of the data (reproducible across runs, appends, and
    // partitionings — the property a training-data sampler must have
    // for auditable dataset lineage). Rank key ln(u)/w never leaves
    // the plan (float keys are compared, not emitted), and the window
    // top-k plans as WindowGroupLimit: per-group k-row state, no
    // global sort of the corpus.
    "q185_weighted_sample" -> QuerySpec(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("u",
            (expr("md5_prefix60(CAST(doc_id AS STRING))") + 1)
              .cast("double") / lit(1152921504606846976.0))
          .withColumn("es_key", log(col("u")) / col("n_chars"))
        d.withColumn("rank",
            row_number().over(
              Window.partitionBy("lang").orderBy(desc("es_key"))))
          .filter(col("rank") <= 5)
          .select(col("lang"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("n_chars").as("weight"))
          .orderBy("lang", "rank")
      },
      """WITH u AS (SELECT lang, doc_id, n_chars,
                      ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                              + 1 AS DOUBLE) / 1152921504606846976.0)
                        / n_chars AS es_key
                    FROM documents),
         r AS (SELECT lang, doc_id, n_chars,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY es_key DESC) AS rank
               FROM u)
         SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
                n_chars AS weight
         FROM r WHERE rank <= 5 ORDER BY lang, rank""")
  )
}
