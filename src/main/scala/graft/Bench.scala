package graft

import java.nio.file.{Files, Paths}

/** Benchmark main. Emits ONE JSON line (stdout AND `bench_out.json`, the
  * file path overridable via SPARK_GRAFT_BENCH_OUT) so the driver never
  * has to fish the line out of sbt log noise.
  *
  * Per round-2 advice: a warmup pass (every query executed once,
  * untimed) absorbs JVM/codegen/scan-cache warmup so per-query numbers
  * are comparable round-over-round, and failures are REPORTED per query
  * (`"errors"` object + non-zero exit) instead of silently timed as -1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")

    // Optional comma-separated name filter for local iteration (the
    // driver sets nothing and benches everything).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // Per query: one CacheScope holding a warmup pass (absorbs JVM/
    // codegen/scan-cache warmup AND materializes any operator-internal
    // persists) and TWO timed passes whose minimum is reported — a
    // single timed pass is exposed to GC/JIT pauses from neighboring
    // queries (BENCH_r04 showed 2–8× phantom regressions that never
    // reproduced in isolation; min-of-2 suppresses them). Afterwards
    // every cache registered by the query is released — a full bench
    // run leaves zero cache entries behind (round-3 advice).
    val results = queries.map { case (name, fn) =>
      CacheScope.scoped {
        try { fn(spark, sfDir).count(); () }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        }
        if (errors.contains(name)) name -> -1.0
        else {
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count(); () }
            catch { case e: Throwable =>
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
            }
            (System.nanoTime() - t0) / 1e9
          }
          name -> (if (errors.contains(name)) -1.0 else times.min)
        }
      }
    }

    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${jq(sfDir)}}"""

    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }

    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
