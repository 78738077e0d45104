package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan auditor: prints the formatted physical plan of each query (or
  * the ones named in args) so scan counts, pushed filters, join
  * strategies, and WholeStageCodegen spans can be reviewed —
  * `sbt "runMain graft.tools.PlanAudit q21_minhash_lsh"`.
  *
  * `SPARK_GRAFT_PLAN_AUDIT=dups` switches to the MULTI-EVALUATION
  * sweep (round 14): for every gate it renders the OPTIMIZED logical
  * plan and reports any expensive call (parse/format/regex/higher-
  * order/hash families) whose exact rendering — full balanced-paren
  * argument list — appears more than once. A repeated rendering means
  * the optimizer left the same expensive computation in the tree
  * twice, the class of defect behind the quadratic q29 and the 5×
  * schema_of_variant dispatch: staged aliases show up as attribute
  * references, never as repeated calls, so true staging reads clean.
  * (Logical plan, not physical — partial/final aggregate phases would
  * double-render every agg input and drown the signal.)
  */
object PlanAudit {

  /** Names whose repeated identical rendering is worth a human look. */
  private[graft] val Expensive = Seq(
    "parse_json(", "from_json(", "from_xml(", "to_json(", "to_xml(",
    "schema_of_variant(", "variant_get(", "try_variant_get(",
    "regexp_extract_all(", "regexp_replace(", "regexp_extract(",
    "transform(", "aggregate(", "zip_with(", "map_zip_with(",
    "split(", "sentences(", "try_to_timestamp(", "md5(",
    "sha2(", "crc32(", "graft_multiformat_ts(",
    // the xpath family, spelled out: callsOf requires '(' immediately
    // after the name, so a bare "xpath" prefix silently matched
    // nothing (round-15 advice) — each concrete function is listed.
    "xpath(", "xpath_string(", "xpath_boolean(", "xpath_short(",
    "xpath_int(", "xpath_long(", "xpath_float(", "xpath_double(",
    "xpath_number(")

  /** Drop every line inside an InMemoryRelation subtree: a cached
    * relation PRINTS its build plan at every reference, so a
    * multi-referenced CacheScope.persist leg would read as N repeated
    * expensive calls while executing exactly once (cache build) plus
    * N columnar reads. Indentation depth = offset of the node name
    * after the `:  +- `-style prefix.
    */
  private[graft] def withoutCachedSubtrees(plan: String): String = {
    def depth(line: String): Int = line.indexWhere(c =>
      c != ' ' && c != ':' && c != '+' && c != '-') match {
      case -1 => line.length
      case i => i
    }
    val out = Seq.newBuilder[String]
    var skipDeeperThan = -1
    plan.linesIterator.foreach { line =>
      val d = depth(line)
      if (skipDeeperThan >= 0 && d > skipDeeperThan) () // inside cached build
      else {
        skipDeeperThan = if (line.contains("InMemoryRelation")) d else -1
        if (skipDeeperThan < 0) out += line
      }
    }
    out.result().mkString("\n")
  }

  /** Every balanced-paren call snippet for `fname` in `plan`. */
  private[graft] def callsOf(plan: String, fname: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = plan.indexOf(fname)
    while (from >= 0) {
      val open = from + fname.length - (if (fname.endsWith("(")) 1 else 0)
      if (open < plan.length && plan.charAt(open) == '(') {
        var depth = 0
        var i = open
        var end = -1
        while (end < 0 && i < plan.length) {
          plan.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ => ()
          }
          i += 1
        }
        if (end > 0) out += plan.substring(from, end + 1)
      }
      from = plan.indexOf(fname, from + 1)
    }
    out.result()
  }

  /** The dups sweep's core, callable from the regression spec: every
    * expensive call whose exact rendering appears more than once in the
    * (cache-subtree-stripped) optimized logical plan string.
    */
  def repeatedExpensiveCalls(optimizedPlan: String): Seq[(String, Int)] = {
    val plan = withoutCachedSubtrees(optimizedPlan)
    Expensive.flatMap(f =>
      callsOf(plan, f).groupBy(identity).collect {
        case (call, hits) if hits.size > 1 => (call, hits.size)
      })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-plan-audit")
    val wanted = args.toSet
    val dupsMode = sys.env.get("SPARK_GRAFT_PLAN_AUDIT").contains("dups")
    // exec mode (r19): run the query through the noop sink FIRST, then
    // print — AdaptiveSparkPlan renders isFinalPlan=true with the
    // runtime join strategies, AQE-coalesced partitioning, and
    // ReusedExchange nodes that the static initial plan cannot show.
    val execMode = sys.env.get("SPARK_GRAFT_PLAN_AUDIT").contains("exec")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted.isEmpty || wanted.contains(name) }
      .foreach { case (name, fn) =>
        try graft.CacheScope.scoped {
          // scoped like Bench/Verify/Probe (r19 advice): exec mode
          // materializes operator-internal persists; without the scope
          // they accumulate across the audit JVM and earlier queries'
          // cached subtrees substitute InMemoryRelation into later
          // queries' plans, making exec-mode plans unrepresentative of
          // standalone runs.
          val df = fn(spark, sfDir)
          if (execMode) df.write.mode("overwrite").format("noop").save()
          val qe = df.queryExecution
          if (dupsMode) {
            val dups = repeatedExpensiveCalls(qe.optimizedPlan.toString)
            if (dups.nonEmpty) {
              flagged += 1
              println(s"\n===== $name: ${dups.size} repeated expensive call(s) =====")
              dups.sortBy(-_._2).take(8).foreach { case (call, n) =>
                println(s"  x$n  ${call.take(160)}")
              }
            }
          } else {
            println(s"\n===== $name =====")
            println(qe.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
        } catch { case e: Throwable =>
          println(s"\n===== $name =====\nPLAN FAILED: $e")
        }
      }
    if (dupsMode) println(s"\n[plan-audit] gates with repeated expensive calls: $flagged")
    spark.stop()
  }
}
