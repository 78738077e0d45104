package graft.sources

import java.net.ServerSocket
import java.nio.file.{Files, Path, Paths}

/** Lifecycle manager for a scratch MongoDB server — the (still
  * environment-blocked) live half of S2, mirroring [[LivePostgres]]:
  * the day a `mongod` binary ships in the container, `available`
  * flips true, the MongoWireSpec live legs stop cancelling, and the
  * documented live-ingest probe becomes a red/green gate — no code
  * change needed (r15 verdict #1's "flips green the moment a mongod
  * ships" contract).
  *
  * Until then this compiles, `available` is false, and the wire plane
  * is attested by the golden byte-vector specs (BSON codec + OP_MSG
  * framing + a loopback fake server driving the full
  * hello → find → getMore cycle).
  */
object LiveMongo {

  final case class Handle(host: String, port: Int, baseDir: Path)

  private val BinDirs = Seq("/usr/local/bin", "/usr/bin", "/opt/mongodb/bin")

  private def findBinary(name: String): Option[String] =
    BinDirs.map(d => Paths.get(d, name)).find(Files.isExecutable)
      .map(_.toString)

  /** True when a mongod server binary is installed. Live spec legs
    * `assume` on this (cancel loudly, never silently pass).
    */
  def available: Boolean = findBinary("mongod").isDefined

  @volatile private var handleOpt: Option[Handle] = None

  /** The per-JVM scratch server, booted on first use (auth disabled,
    * loopback only — the same trust posture as the scratch Postgres;
    * F5's host guard applies on the client side regardless).
    */
  def get(): Handle = handleOpt.getOrElse(synchronized {
    handleOpt.getOrElse {
      val h = start()
      handleOpt = Some(h)
      sys.addShutdownHook(stop(h))
      h
    }
  })

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def start(): Handle = {
    val mongod = findBinary("mongod").getOrElse(
      sys.error("mongod not found (checked " + BinDirs.mkString(", ") + ")"))
    val nonce = java.lang.Long.toHexString(
      ProcessHandle.current().pid() ^ System.nanoTime())
    val base = Paths.get(s"/tmp/graft_mongo_live_$nonce")
    val data = base.resolve("data")
    Files.createDirectories(data)
    val port = freePort()
    val pb = new ProcessBuilder(mongod,
      "--dbpath", data.toString, "--port", port.toString,
      "--bind_ip", "127.0.0.1", "--fork",
      "--logpath", base.resolve("mongod.log").toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outText = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    if (code != 0) sys.error(s"mongod start failed ($code): $outText")
    // Wait for the listener: the wire handshake is the readiness probe.
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try {
        val c = MongoWireClient.connect("127.0.0.1", port,
          connectTimeoutMs = 1000)
        c.close(); up = true
      } catch { case _: Throwable => Thread.sleep(200) }
    }
    if (!up) sys.error("mongod did not become reachable within 30s; " +
      s"log: ${base.resolve("mongod.log")}")
    Handle("127.0.0.1", port, base)
  }

  private def stop(h: Handle): Unit =
    try {
      val c = MongoWireClient.connect(h.host, h.port, connectTimeoutMs = 2000)
      try {
        import BsonCodec._
        val _ = c.runCommand("admin", BDoc("shutdown" -> BInt32(1)))
      } catch { case _: Throwable => () } // shutdown closes the socket mid-reply
      finally c.close()
      val _ = new ProcessBuilder("rm", "-rf", h.baseDir.toString).start().waitFor()
    } catch { case _: Throwable => () }
}
