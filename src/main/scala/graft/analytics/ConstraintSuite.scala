package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification — the contract gate a 100 TB
  * ingest runs before publishing a table (the Deequ/"data unit test"
  * shape, rebuilt Spark-first): callers declare WHAT must hold
  * (completeness, domain membership, ranges, key uniqueness, foreign
  * keys) and the suite compiles the whole declaration into the fewest
  * possible jobs over the data.
  *
  * Cost model, by constraint kind:
  *  - [[ConstraintSuite.Satisfies]] (null checks, domains, ranges,
  *    arbitrary row predicates): ALL of them fold into ONE aggregate
  *    scan — each is a `sum(case when pred)` next to `count(*)`, so a
  *    suite of 50 row constraints still reads the table exactly once
  *    with map-side combine and shuffles one partial row per
  *    partition.
  *  - [[ConstraintSuite.Unique]]: an exact `count(distinct …)` rides
  *    in the same aggregate (Spark plans the distinct via expand —
  *    one extra shuffle keyed on the checked tuple, the honest price
  *    of exactness; callers who can trade exactness for scale point
  *    the same predicate at `graft_hll` instead).
  *  - [[ConstraintSuite.SubsetOf]] (referential integrity): a
  *    dimension-sized ref (`broadcastRef`, the common case) folds
  *    into the SAME single scan — the deduplicated key set is
  *    broadcast-left-joined onto the table and the match count rides
  *    in the shared aggregate, so B dimension FKs cost B broadcast
  *    probes on one pass, zero extra scans. A fact-sized ref falls
  *    back to one shuffled anti join per constraint (its own shuffle
  *    is inherent), with `n_rows` reused from the shared aggregate
  *    rather than recounted.
  *
  * Output is the audit artifact itself: one row per constraint with
  * the measured metric in exact ppm (`ok·10⁶ div n` — integer
  * arithmetic, engine-portable), the violation count, and a
  * 'pass'/'fail' status. Metrics are always emitted, not just the
  * boolean — the trend of a metric across daily runs is the drift
  * signal, and a CI gate can threshold it without re-scanning.
  */
object ConstraintSuite {

  sealed trait Constraint { def name: String }

  /** Row-level predicate that must hold on every row (completeness,
    * set membership, value ranges, cross-column rules). NULL
    * predicate results count as violations — a null `x > 0` is not
    * evidence of health.
    */
  final case class Satisfies(name: String, predicate: Column)
      extends Constraint

  /** The checked tuple must be unique across the table (primary /
    * natural key). Violations = n_rows − n_distinct_tuples.
    */
  final case class Unique(name: String, cols: Seq[Column])
      extends Constraint

  /** Every non-null value of `col` must appear in `ref.refCol`
    * (foreign key). `broadcastRef` marks the dimension-sized case.
    */
  final case class SubsetOf(
      name: String, col: Column, ref: DataFrame, refCol: String,
      broadcastRef: Boolean = true)
      extends Constraint

  /** Runs the suite; returns (check_name, metric_ppm, n_violations,
    * status) ordered by check name. (`check_name`, not `constraint` —
    * CONSTRAINT is reserved in most SQL dialects and the audit table
    * should be queryable without quoting.)
    */
  def evaluate(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    require(
      constraints.map(_.name).distinct.size == constraints.size,
      "constraint names must be unique")
    val spark = df.sparkSession
    import spark.implicits._

    val rowCs = constraints.collect { case c: Satisfies => c }
    val uniqCs = constraints.collect { case c: Unique => c }
    val subCs = constraints.collect { case c: SubsetOf => c }
    val bSubs = subCs.filter(_.broadcastRef).zipWithIndex
    val sSubs = subCs.filterNot(_.broadcastRef)

    // Broadcast-ref FK checks fold into the SAME single scan as the
    // row predicates: left-join each deduplicated (hence
    // multiplicity-1) broadcast key set onto the audited table and
    // count matches in the shared aggregate — a suite of B dimension
    // FKs costs B broadcast probes on one pass, not B extra
    // table scans (round-11 advice: the per-constraint recount is
    // gone entirely for the dimension case).
    //
    // The probe columns are synthetic `__graft_ref_<i>` names; an
    // audited frame that already carries one would make the join
    // condition ambiguous or silently mis-bind the matched-count
    // (round-12 advice) — fail loudly up front instead.
    if (bSubs.nonEmpty) {
      val clash = df.columns.filter(_.startsWith("__graft_ref_"))
      require(clash.isEmpty,
        s"audited DataFrame carries reserved column(s) ${clash.mkString(", ")}" +
          " — rename them before auditing (ConstraintSuite reserves the" +
          " __graft_ref_ prefix for broadcast FK probes)")
    }
    val widened = bSubs.foldLeft(df) { case (acc, (c, i)) =>
      val refKeys = c.ref.select(col(c.refCol).as(s"__graft_ref_$i")).distinct()
      acc.join(broadcast(refKeys), c.col === col(s"__graft_ref_$i"), "left")
    }

    // One pass: n_rows + one conditional sum per row predicate + one
    // exact distinct per uniqueness constraint + one matched-count per
    // broadcast FK. Aggregate aliases are
    // POSITIONAL (__ok_0, __d_1, …), never name-derived: constraint
    // names are caller data and must stay out of every parsed surface
    // — a name with a quote, comma, or backtick would otherwise break
    // (or silently mis-bind) the alias and long-format SQL.
    val aggs: Seq[Column] =
      count(lit(1)).cast("long").as("__n") +:
        (rowCs.zipWithIndex.map { case (c, i) =>
          sum(when(c.predicate, 1L).otherwise(0L)).cast("long")
            .as(s"__ok_$i")
        } ++
          uniqCs.zipWithIndex.map { case (c, i) =>
            count_distinct(struct(c.cols: _*)).cast("long")
              .as(s"__d_$i")
          } ++
          bSubs.map { case (c, i) =>
            // ok = null FK (not evidence either way) or matched
            sum(when(c.col.isNull.or(col(s"__graft_ref_$i").isNotNull), 1L)
              .otherwise(0L)).cast("long").as(s"__fk_$i")
          })
    val one = widened.agg(aggs.head, aggs.tail: _*)

    // Long format: explode an array of (name, n_ok) structs — typed
    // Column ops only, so constraint names ride as literal VALUES
    // (never through a SQL parser). A suite of only referential checks
    // has nothing to explode — the aggregate row then exists purely to
    // anchor later unions, so it contributes zero rows here.
    val pairs: Seq[(String, String)] =
      rowCs.zipWithIndex.map { case (c, i) => c.name -> s"__ok_$i" } ++
        uniqCs.zipWithIndex.map { case (c, i) => c.name -> s"__d_$i" } ++
        bSubs.map { case (c, i) => c.name -> s"__fk_$i" }
    val stacked =
      if (pairs.isEmpty)
        one.select(col("__n"), lit("").as("check_name"),
          lit(0L).as("__ok")).limit(0)
      else one.select(
        col("__n"),
        explode(array(pairs.map { case (n, c) =>
          struct(lit(n).as("check_name"), col(c).as("ok"))
        }: _*)).as("__e"))
        .select(col("__n"), col("__e.check_name").as("check_name"),
          col("__e.ok").as("__ok"))

    // Fact-sized (non-broadcast) referential constraints: one shuffled
    // anti-join count each — those genuinely need their own shuffle.
    // `__n` comes from the SAME aggregate as everything else
    // (`one.select(__n)` — the identical subtree deduplicates at
    // execution), not a per-constraint recount of the audited table.
    val subRows: Seq[DataFrame] = sSubs.map { c =>
      val refKeys = c.ref.select(col(c.refCol).as("__ref")).distinct()
      val viol = df.select(c.col.as("__v"))
        .filter(col("__v").isNotNull)
        .join(refKeys, col("__v") === col("__ref"), "left_anti")
        .agg(count(lit(1)).cast("long").as("__viol"))
      one.select(col("__n"))
        .crossJoin(viol)
        .select(col("__n"), lit(c.name).as("check_name"),
          (col("__n") - col("__viol")).as("__ok"))
    }

    val all = subRows.foldLeft(stacked)((acc, d) =>
      acc.unionByName(d.select("__n", "check_name", "__ok")))
    all.select(
      col("check_name"),
      // ppm through DECIMAL(38,0) like every other ppm site: __ok·10⁶
      // in BIGINT wraps past ~9.2e12 rows — real at 100 TB.
      when(col("__n") === 0, lit(1000000L))
        .otherwise(expr(
          "CAST((CAST(__ok AS DECIMAL(38,0)) * 1000000) div __n AS BIGINT)"))
        .cast("long")
        .as("metric_ppm"),
      (col("__n") - col("__ok")).cast("long").as("n_violations"),
      when(col("__ok") === col("__n"), lit("pass")).otherwise(lit("fail"))
        .as("status"))
      .orderBy("check_name")
  }
}
