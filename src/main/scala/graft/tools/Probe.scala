package graft.tools

/** Scratch probe: time one named query at SPARK_GRAFT_SF_DIR. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[probe] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
