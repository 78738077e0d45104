package graft.queries

import java.nio.file.{Files, Path}

/** Per-invocation temp directories for gate queries that materialize
  * files (bucketed tables, format roundtrips): unique per call — two
  * concurrent runs never share a path, and nothing stale survives into
  * a later comparison — and reaped at JVM exit (results are read
  * lazily, so the data must outlive the returned frame).
  */
private[queries] object GateTmp {

  private val reaper = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  sys.addShutdownHook(reaper.forEach { p =>
    try deleteRecursively(p) catch { case _: Throwable => () }
  })

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }

  /** A fresh temp dir, deleted at JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    reaper.add(p)
    p
  }
}
