package graft.tools

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's smoke check: run SparkEntry.entry on a
  * fresh session and assert rows > 0. `sbt "runMain graft.tools.EntrySmoke"`.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("graft-entry-smoke")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(25, truncate = false)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
