package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{CacheScope, SparkEntry, SparkTestSession}
import graft.tools.PlanAudit

/** Round-15 promotion of the PlanAudit multi-evaluation sweep to a
  * failing regression gate (round-14 verdict #4): the sweep that caught
  * the 13-round quadratic `Dedup.shingles` (a Spark higher-order
  * function re-evaluates captured non-lambda subtrees per element) and
  * the 9×-re-split q26 runs on every `sbt test` instead of manually.
  *
  * For every gate in `SparkEntry.queries` the OPTIMIZED logical plan is
  * rendered and scanned for expensive calls (parse/format/regex/HOF/
  * hash families) whose exact balanced-paren rendering appears more
  * than once outside cached (`InMemoryRelation`) subtrees. A repeated
  * rendering means the same expensive computation is left in the tree
  * twice — the fingerprint of the lambda-capture / unstaged-alias
  * defect class. Staged expressions show up as attribute references and
  * read clean.
  *
  * The allowlist pins the gates where the ×2–3 is made by the OPTIMIZER
  * and was triaged in round 14 (SCALING.md): predicate pushdown copies
  * a defining `split` below the Project that aliases it (the q13-class)
  * and bounded per-round BPE rewrites. All are sub-second gates where
  * undoing the pushdown would cost more than the duplicate evaluation.
  * A new gate joining this list must be triaged the same way — add it
  * here WITH the reason, or stage the expression.
  */
class PlanAuditRegressionSpec extends AnyFunSuite with SparkTestSession {

  /** gate → why its optimizer-made duplicate rendering is acceptable. */
  private val triaged: Map[String, String] = Map(
    "q13_explode_freq_array" -> "pushdown copies split below its aliasing Project (x3, sub-second)",
    "q200_curation_pipeline" -> "pushdown copies split below its aliasing Project (x2)",
    "q241_ngram_lm_score" -> "per-order n-gram legs each re-derive the split; bounded x2 per leg",
    "q253_minhash_estimate" -> "zip_with agreement leg rendered in both sum and count (x2, array-typed)",
    "q254_drop_reasons" -> "pushdown copies split below its aliasing Project (x2)",
    "q40_repetition" -> "pushdown copies split below its aliasing Project (x2)")
  // r19: q52 and q65 left this list — their formerly-duplicated shingle/
  // tf legs now read a CacheScope-persisted relation, so the renderings
  // sit inside InMemoryRelation subtrees the sweep correctly skips.

  test("no gate renders an expensive expression more than once (optimized plan)") {
    val sfDir = "/root/testdata/sf0.001"
    // 4-way parallel sweep (r20): planning 313 gates is driver-side
    // Catalyst work plus each gate's construction-time side jobs —
    // sequential it was 135 s of the driver's test budget, mostly one
    // idle core. Each worker plans on its OWN cloned session (own
    // SQLConf + temp-view namespace), so gate-internal SqlConfScope
    // brackets and temp views cannot race across threads; CacheScope
    // is thread-local already. Same 313-gate assertion surface.
    val offenders =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Int)]]()
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // The live-PG gates share ONE scratch Postgres cluster and their
    // construction runs real DDL (CREATE SCHEMA IF NOT EXISTS is not
    // concurrent-safe in PG — duplicate pg_namespace key); serialize
    // exactly those under one mutex, everything else fans out freely.
    val livePgLock = new Object
    val livePg = Set("q312_pg_live_roundtrip", "q313_pg_dsv2_write", "q315_wire_e2e")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val s = spark.newSession()
            CacheScope.scoped {
              try {
                def plan() = PlanAudit.repeatedExpensiveCalls(
                  fn(s, sfDir).queryExecution.optimizedPlan.toString)
                val dups =
                  if (livePg(name)) livePgLock.synchronized(plan()) else plan()
                if (dups.nonEmpty && !triaged.contains(name)) offenders.put(name, dups)
              } catch {
                // A gate that cannot even PLAN must fail here too — silent
                // skips would hollow the sweep out one broken gate at a time.
                case e: Throwable => failed.add(s"$name: ${e.getMessage}")
              }
            }
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    assert(failed.isEmpty,
      s"gates failed to plan:\n  ${failed.asScala.toSeq.sorted.mkString("\n  ")}")
    assert(
      offenders.isEmpty,
      "non-triaged gates render an expensive expression more than once " +
        "(stage it under an alias in its own Project, or triage it in " +
        "PlanAuditRegressionSpec with a reason):\n" +
        offenders.asScala.toSeq.sortBy(_._1).map { case (n, ds) =>
          s"  $n:\n" + ds.map { case (c, k) => s"    x$k ${c.take(140)}" }.mkString("\n")
        }.mkString("\n"))
  }

  test("triaged allowlist carries no stale entries") {
    val sfDir = "/root/testdata/sf0.001"
    val stale = triaged.keys.toSeq.sorted.filter { name =>
      SparkEntry.queries.get(name).forall { fn =>
        CacheScope.scoped {
          try PlanAudit.repeatedExpensiveCalls(
            fn(spark, sfDir).queryExecution.optimizedPlan.toString).isEmpty
          catch { case _: Throwable => false }
        }
      }
    }
    assert(stale.isEmpty,
      s"allowlist entries no longer flag — remove them: ${stale.mkString(", ")}")
  }
}
