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

  def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A =
    withConf(s, "spark.sql.shuffle.partitions", n.toString)(body)

  /** Generic save/set/try/finally bracket for ANY session conf (round-13
    * advice: q310 set `spark.sql.scripting.enabled` on the shared session
    * and never restored it, leaking a session-global change into every
    * later query of the sweep).
    *
    * Exit-state precision (round-15 advice): for a REGISTERED SQL conf
    * (`spark.sql.scripting.enabled`, `spark.sql.shuffle.partitions`, …)
    * `getOption` returns the compiled-in default even when the key was
    * never set, so the finally re-SETS that resolved default rather
    * than restoring a pristine "never set" state. Observable reads are
    * identical either way; only a key that is UNREGISTERED and unset on
    * entry (arbitrary string keys) takes the `unset` branch. If a
    * future caller needs default-tracking semantics (a default that
    * changes with a dependent conf), it must snapshot via SQLConf
    * internals instead.
    */
  def withConf[A](s: SparkSession, key: String, value: String)(body: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
