package graft.queries

import org.apache.spark.sql.SparkSession

/** The ONE save/set/try/finally bracket for scoping
  * `spark.sql.shuffle.partitions` around an eager action (round-13
  * review: five near-identical inline copies had accumulated across
  * the streaming drains and the iterative-BSP gates).
  *
  * CONCURRENCY CONTRACT: the override is session-global for the
  * bracketed body — a query planned concurrently on the SAME session
  * during the window shuffles at `n`. The gate/bench/verify runners
  * are single-threaded by design, which is what makes this scoping
  * sound; a concurrent runner must clone the session
  * (`spark.newSession()`) before calling a gate that uses it.
  *
  * The body must TRIGGER the work whose exchanges it wants narrowed
  * (an action, a stream drain, an eager localCheckpoint loop):
  * shuffle width is read at execution, not plan construction.
  */
object SqlConfScope {

  def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
