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
      val walk = Files.walk(p)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(f => Files.deleteIfExists(f))
    }

  /** Memory-backed scratch when the host offers it: gate artifacts
    * (stream staging/checkpoints, bucketed tables, roundtrip files)
    * are transient by construction, so tmpfs spares the disk the
    * checkpoint-commit fsync traffic. Production streaming checkpoints
    * belong on RELIABLE storage — this shortcut is for the per-run
    * throwaway dirs only.
    */
  private val base: Option[Path] = {
    val shm = Path.of("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm) else None
  }

  /** A fresh temp dir, deleted at JVM exit. */
  def dir(prefix: String): Path = {
    val p = base match {
      case Some(b) => Files.createTempDirectory(b, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    reaper.add(p)
    p
  }
}
