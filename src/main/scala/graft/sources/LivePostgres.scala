package graft.sources

import java.net.ServerSocket
import java.nio.file.{Files, Path, Paths}

/** Lifecycle manager for a scratch PostgreSQL server — the live half of
  * the K1/K3 connector gates. The container ships the Postgres 15
  * server binaries but no JDBC driver, so the live round-trip
  * (q312, PgLiveRoundTripSpec) boots its own throwaway cluster under
  * /tmp and talks to it over [[PgWireClient]].
  *
  * Postgres refuses to run as root, so when the JVM runs as root every
  * server-side command is executed as the `postgres` system user via
  * `su` (the cluster directory lives under world-writable /tmp and is
  * created BY that user, so ownership is right by construction). A
  * non-root JVM runs the binaries directly.
  *
  * One cluster per JVM (lazy singleton), stopped and deleted by a
  * shutdown hook — the bench's repeated gate passes reuse the running
  * server and pay only their own DDL + COPY.
  */
object LivePostgres {

  final case class Handle(host: String, port: Int, user: String,
      database: String, baseDir: Path)

  private val BinDirs = Seq("/usr/local/bin", "/usr/bin") ++
    (try {
      val d = Paths.get("/usr/lib/postgresql")
      if (Files.isDirectory(d)) {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.resolve("bin").toString).toSeq
        } finally s.close()
      } else Nil
    } catch { case _: Throwable => Nil })

  private def findBinary(name: String): Option[String] =
    BinDirs.map(d => Paths.get(d, name)).find(Files.isExecutable)
      .map(_.toString)

  /** Both server binaries present? The round-trip spec `assume`s on
    * this so an environment without Postgres cancels loudly instead of
    * failing; the q312 GATE does not guard — a driver environment that
    * loses the binaries should surface as a red gate, not a silent
    * skip.
    */
  def available: Boolean =
    findBinary("initdb").isDefined && findBinary("pg_ctl").isDefined

  private def isRoot: Boolean = System.getProperty("user.name") == "root"

  /** Run a shell command, as the postgres user when the JVM is root.
    * Working directory is the base dir (su'd users cannot read
    * /root/...; `su` warns on an unreadable cwd).
    */
  private def run(cmd: String, cwd: Path): (Int, String) = {
    val argv: Seq[String] =
      if (isRoot) Seq("su", "postgres", "-s", "/bin/sh", "-c", cmd)
      else Seq("/bin/sh", "-c", cmd)
    val pb = new ProcessBuilder(argv: _*)
    pb.directory(cwd.toFile)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    (code, out)
  }

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  @volatile private var handleOpt: Option[Handle] = None

  /** The per-JVM scratch server, booted on first use. Throws with the
    * failing command's output if the cluster cannot start.
    */
  def get(): Handle = handleOpt.getOrElse(synchronized {
    handleOpt.getOrElse {
      val h = start()
      handleOpt = Some(h)
      sys.addShutdownHook(stop(h))
      h
    }
  })

  /** Reap clusters leaked by SIGKILL'd JVMs (shutdown hooks never ran):
    * any `/tmp/graft_pg_live_*` whose postmaster pid is dead is stopped
    * (best-effort, in case orphaned backends linger) and deleted; one
    * with a LIVE postmaster belongs to a running JVM and is left alone.
    * Runs once per boot, so leaks are bounded by one crashed run.
    */
  private def reapStaleClusters(): Unit =
    try {
      val tmp = Paths.get("/tmp")
      val s = Files.list(tmp)
      val stale = try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("graft_pg_live_"))
          .filter { base =>
            val pidFile = base.resolve("data/postmaster.pid")
            val alive =
              try {
                val pid = Files.readAllLines(pidFile).get(0).trim.toLong
                ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
              } catch { case _: Throwable => false } // unreadable = not running
            !alive
          }.toSeq
      } finally s.close()
      stale.foreach { base =>
        findBinary("pg_ctl").foreach(pgCtl =>
          run(s"$pgCtl -D ${base.resolve("data")} -m immediate stop", tmp))
        run(s"rm -rf $base", tmp)
      }
    } catch { case _: Throwable => () } // reaping is never load-bearing

  private def start(): Handle = {
    val initdb = findBinary("initdb").getOrElse(
      sys.error("initdb not found (checked " + BinDirs.mkString(", ") + ")"))
    val pgCtl = findBinary("pg_ctl").getOrElse(sys.error("pg_ctl not found"))
    reapStaleClusters()
    val nonce = java.lang.Long.toHexString(
      ProcessHandle.current().pid() ^ System.nanoTime())
    val base = Paths.get(s"/tmp/graft_pg_live_$nonce")
    val data = base.resolve("data")
    // The postgres user creates the tree itself (under /tmp's sticky
    // world-writable root) so ownership is correct without chown.
    val (mkCode, mkOut) = run(
      s"mkdir -p $data && $initdb -D $data -A trust -U postgres -E UTF8 " +
        s"--locale=C > $base/initdb.log 2>&1", Paths.get("/tmp"))
    if (mkCode != 0) sys.error(s"initdb failed ($mkCode): $mkOut")
    val port = freePort()
    // listen on loopback only; unix socket inside the base dir (not
    // /var/run); UTC so timestamptz text is deterministic for oracles.
    val (stCode, stOut) = run(
      s"""$pgCtl -D $data -w -t 60 -l $base/server.log start -o "-p $port -c listen_addresses=127.0.0.1 -c unix_socket_directories=$base -c timezone=UTC -c fsync=off -c synchronous_commit=off"""",
      base)
    if (stCode != 0) {
      val log = try Files.readString(base.resolve("server.log"))
      catch { case _: Throwable => "" }
      sys.error(s"pg_ctl start failed ($stCode): $stOut\n${log.takeRight(2000)}")
    }
    Handle("127.0.0.1", port, "postgres", "postgres", base)
  }

  private def stop(h: Handle): Unit = {
    try {
      findBinary("pg_ctl").foreach { pgCtl =>
        run(s"$pgCtl -D ${h.baseDir.resolve("data")} -m immediate stop", h.baseDir)
      }
      // Best-effort cleanup; the postgres-owned tree needs the same
      // user to delete it when the JVM runs as root.
      run(s"rm -rf ${h.baseDir}", Paths.get("/tmp"))
      ()
    } catch { case _: Throwable => () }
  }
}
