package graft.etl

/** F5 — connection host allow-list, reference `ui/mongo_ingest.py:27-29`
  * / `ui/postgres_setup.py:40-42`: external source/sink hosts must be
  * local; anything else is rejected at config time.
  */
object HostGuard {

  val allowedHosts: Set[String] = Set("localhost", "127.0.0.1", "::1")

  def isAllowed(host: String): Boolean =
    allowedHosts.contains(host.trim.toLowerCase)

  def requireLocal(host: String, what: String = "database"): Unit =
    if (!isAllowed(host))
      throw new ConfigError(
        s"Only local $what hosts are allowed (got '$host'). " +
          s"Permitted: ${allowedHosts.toSeq.sorted.mkString(", ")}.")
}
