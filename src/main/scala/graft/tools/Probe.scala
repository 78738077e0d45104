package graft.tools

/** Scratch probe: time one named query at SPARK_GRAFT_SF_DIR.
  * Times through the noop sink like Bench — `.count()` lets Catalyst
  * prune the very transforms a profiling run wants to see (the
  * round-14 lesson); the row count is taken separately, untimed.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("probe")
    var dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      // `dir=<path>` switches the active data dir mid-run, so a multi-
      // scale probe session keeps ONE warm JVM across every dir —
      // per-dir JVM restarts put codegen/JIT warmup into the first
      // dir's passes and fake a flattened scaling curve.
      if (name.startsWith("dir=")) {
        dir = name.substring(4)
        println(s"[probe] dir -> $dir")
      } else {
        val fn = graft.SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val n = fn(spark, dir).count()
        println(f"[probe] $name: $n rows in $dt%.2f s (noop-sink timed)")
      }
    }
    spark.stop()
  }
}
