package graft.queries

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape and crafted-corpus checks for the round-9 statistics /
  * similarity / retrieval gates — the properties the sf0.01 oracle
  * pass can't see: that the plans are the SCALE-SHAPED ones, and that
  * the statistics hit their closed-form values on inputs small enough
  * to verify by hand.
  */
class StatGatesSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q185 weighted sample plans as WindowGroupLimit, not a global sort") {
    val plan = executedPlan("q185_weighted_sample")
    assert(plan.contains("WindowGroupLimit"),
      s"per-group top-k fell back to a full window sort:\n$plan")
  }

  test("q190 ppjoin never degenerates to a cartesian product") {
    val plan = executedPlan("q190_ppjoin")
    assert(!plan.contains("CartesianProduct"),
      s"prefix-filter join degenerated to a cross join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"prefix-filter join degenerated to a nested loop:\n$plan")
  }

  test("q195 panel chains two native as-of merges") {
    // the exec node prints as "GraftAsOfJoin" (Spark strips the Exec
    // suffix from nodeName)
    val plan = executedPlan("q195_event_panel")
    val n = "GraftAsOfJoin".r.findAllIn(plan).length
    assert(n === 2, s"expected 2 native as-of execs, found $n:\n$plan")
  }

  test("q183 IVM equals full recompute when one or both deltas are empty") {
    // delta predicates: o_orderkey % 10 = 0, c_custkey % 13 = 0 — at
    // sf0.001 both are non-empty; the identity itself is what the
    // oracle checks. Here: the gate result must equal a direct join
    // computed independently.
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q183_ivm_delta_join")(spark, dir)
      .collect().toSeq
    val o = graft.Tables.orders(spark, dir)
    val c = graft.Tables.customer(spark, dir)
    val n = graft.Tables.nation(spark, dir)
    val want = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_e2"))
      .orderBy("n_name").collect().toSeq
    assert(got === want)
  }

  test("q198 AUC hits closed forms on separable / reversed / constant scores") {
    import spark.implicits._
    def auc(rows: Seq[(Int, Int)]): Long = {
      rows.toDF("score", "label").createOrReplaceTempView("auc_in")
      spark.sql(
        """WITH ranked AS (SELECT label,
                                  rank() OVER (ORDER BY score) AS rmin,
                                  count(*) OVER (PARTITION BY score) AS tc
                           FROM auc_in),
            agg AS (SELECT CAST(sum(CASE WHEN label = 1
                                         THEN 2*rmin + tc - 1 END) AS BIGINT)
                             AS r2_pos,
                           CAST(sum(label) AS BIGINT) AS n_pos,
                           CAST(count(*) - sum(label) AS BIGINT) AS n_neg
                    FROM ranked)
            SELECT ((r2_pos - n_pos * (n_pos + 1)) * 1000000)
                     div (2 * n_pos * n_neg) AS auc_ppm
            FROM agg""").head().getLong(0)
    }
    // positives all score higher -> AUC 1; all lower -> 0; one tied
    // score -> 1/2 by the tie convention
    assert(auc(Seq((10, 1), (9, 1), (2, 0), (1, 0))) === 1000000L)
    assert(auc(Seq((1, 1), (2, 1), (9, 0), (10, 0))) === 0L)
    assert(auc(Seq((5, 1), (5, 0), (5, 1), (5, 0))) === 500000L)
  }

  test("q203 CUSUM finds a planted level shift at the step day") {
    import spark.implicits._
    // 10 days at 100, then 10 days at 200: argmax |S_t| is the last
    // low day (t=10)
    val days = (1 to 20).map(i =>
      (f"2024-01-$i%02d", if (i <= 10) 100L else 200L))
    days.toDF("d", "cents").createOrReplaceTempView("cusum_in")
    val row = spark.sql(
      """WITH series AS (SELECT d, cents,
                                row_number() OVER (ORDER BY d) AS t,
                                sum(cents) OVER (ORDER BY d
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS prefix,
                                count(*) OVER () AS n,
                                sum(cents) OVER () AS total
                         FROM cusum_in),
          dev AS (SELECT d, t, n, prefix, total,
                         abs(n * prefix - t * total) AS cusum_n
                  FROM series WHERE t < n)
          SELECT d, prefix div t AS pre, (total - prefix) div (n - t) AS post
          FROM dev ORDER BY cusum_n DESC, d LIMIT 1""").head()
    assert(row.getString(0) === "2024-01-10")
    assert(row.getLong(1) === 100L)
    assert(row.getLong(2) === 200L)
  }

  test("q194 moving median resists an outlier the mean would absorb") {
    import spark.implicits._
    val days = Seq(("d1", 100L), ("d2", 100L), ("d3", 9999L),
      ("d4", 100L), ("d5", 100L))
    days.toDF("d", "cents").createOrReplaceTempView("mm_in")
    val out = spark.sql(
      """WITH w AS (SELECT d, cents,
                           sort_array(collect_list(cents) OVER
                             (ORDER BY d ROWS BETWEEN 6 PRECEDING
                              AND CURRENT ROW)) AS arr
                    FROM mm_in)
         SELECT d, element_at(arr, CAST((size(arr) + 1) div 2 AS INT))
         FROM w ORDER BY d""").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(100L, 100L, 100L, 100L, 100L))
  }

  test("q196 sliding distinct covers exactly the 7 window-ends per day") {
    import spark.implicits._
    Seq(("2024-03-01 00:00:00", 1L))
      .toDF("ts_s", "user_id")
      .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "user_id")
      .createOrReplaceTempView("sd_in")
    val out = spark.sql(
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
                     FROM sd_in),
         cover AS (SELECT explode(sequence(d, date_add(d, 6))) AS w, user_id
                   FROM du)
         SELECT count(*) FROM cover""").head().getLong(0)
    assert(out === 7L)
  }
}
