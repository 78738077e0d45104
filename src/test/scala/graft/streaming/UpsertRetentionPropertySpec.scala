package graft.streaming

import java.nio.file.{Files, Path}

import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.SparkTestSession

/** Retention-interleaving fuzz of the manifest store's retention
  * machinery — random sequences of {merge a batch, vacuum(retainLast),
  * pin a version, release a pin, kill a vacuum mid-run (stale
  * in-progress marker), operator-clear the marker} with time-travel
  * reads asserted after EVERY step, the retention-side companion to
  * [[UpsertCrashPropertySpec]]'s crash fuzz. The round-14 marker ops
  * pin the recovery contract: while a stale marker exists pin
  * acquisition refuses loudly (never a silent pin), and either a
  * completing vacuum or a manual delete restores service:
  *
  *  - a version the model says is retained (inside the newest-N
  *    window at its last vacuum, or pinned through it) stays readable
  *    AND equal to the driver-side LWW fold of the batch prefix it
  *    covers — i.e. vacuuming never reclaims a file a surviving
  *    manifest's carry-forward closure still references;
  *  - a version the model says is reclaimed fails LOUDLY on read;
  *  - the newest version is readable at all times;
  *  - releasing a pin makes the version reclaimable by the NEXT
  *    vacuum, never retroactively.
  *
  * Drives [[StreamingUpsert.mergeBatch]] directly (the extracted
  * foreachBatch body) with the same carried state mergeStream holds,
  * so the fuzz composes merges, retention and pins exactly the way a
  * production drain interleaved with maintenance would.
  */
object UpsertRetentionPropertySpec extends Properties("UpsertRetention") {

  // 4 workers (r20): cases are independent — own temp dir, own cloned
  // session (below). Same 40-case surface, ~4× less wall-clock (this
  // suite was ~110 s of the driver's test budget; guide §2.6).
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40).withWorkers(4)

  private lazy val sharedSpark = SparkTestSession.session

  private final case class R(k: Long, v: Long, seq: Long, op: String)

  private sealed trait Op
  private final case class Merge(rows: List[R]) extends Op
  private final case class Vacuum(retainLast: Int) extends Op
  private final case class Pin(versionPick: Int) extends Op
  private final case class Release(pinPick: Int) extends Op
  /** A vacuum killed mid-run: its in-progress marker survives on disk.
    * Until cleared, pin acquisition must REFUSE loudly (the round-14
    * plant-then-check handshake); a completing vacuum overwrite-plants
    * and removes it, which is one of the two documented recovery paths.
    */
  private case object KillVacuum extends Op
  /** The other recovery path: the operator deletes the stale marker. */
  private case object ClearMarker extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> (for {
      n <- Gen.choose(1, 3)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 4L)
        v <- Gen.choose(0L, 99L)
        shuf <- Gen.choose(0L, 999L)
        op <- Gen.frequency(4 -> Gen.const("upsert"), 1 -> Gen.const("delete"))
      } yield (k, v, shuf, op))
    } yield Merge(rows.map { case (k, v, s, o) => R(k, v, s, o) })),
    3 -> Gen.choose(1, 3).map(Vacuum(_)),
    2 -> Gen.choose(0, 100).map(Pin(_)),
    2 -> Gen.choose(0, 100).map(Release(_)),
    1 -> Gen.const(KillVacuum),
    1 -> Gen.const(ClearMarker))

  private val caseGen: Gen[List[Op]] = for {
    n <- Gen.choose(5, 10)
    ops <- Gen.listOfN(n, opGen)
  } yield {
    // make sequences unique and cross-batch shuffled, like the crash fuzz
    var i = 0
    ops.map {
      case Merge(rows) =>
        Merge(rows.map { r => i += 1; r.copy(seq = r.seq * 1000L + i) })
      case other => other
    }
  }

  private def lwwLive(rows: Seq[R]): Map[Long, Long] =
    rows.groupBy(_.k).flatMap { case (k, rs) =>
      val top = rs.maxBy(_.seq)
      if (top.op == "upsert") Some(k -> top.v) else None
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))

  property("random merge/vacuum/pin/read interleavings keep exactly the modeled versions readable and exact") =
    forAll(caseGen) { ops =>
      // per-case cloned session: the narrow width is case-local, no
      // shared-session set/restore to race across workers
      val spark = sharedSpark.newSession()
      import spark.implicits._
      val root = Files.createTempDirectory("graft-retentionfuzz")
      val dir = root.resolve("snap").toString
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        var state = StreamingUpsert.Manifest(SortedMap.empty, Long.MinValue, -1L)
        var nextId = 0L
        // model: version -> the LWW fold its snapshot must equal
        var expected = Map.empty[Long, Map[Long, Long]]
        var present = Set.empty[Long] // versions the model says are readable
        var merged = List.empty[R]
        var pins = List.empty[(StreamingUpsert.PinHandle, Long)]

        def liveAt(v: Long): Map[Long, Long] =
          StreamingUpsert.snapshotAt(spark, dir, v)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

        var ok = true
        var failure = ""
        def check(label: String): Unit = if (ok) {
          present.foreach { v =>
            val got =
              try Right(liveAt(v))
              catch { case e: Exception => Left(e.getMessage) }
            if (got != Right(expected(v))) {
              ok = false
              failure = s"$label: retained v$v read $got, expected Right(${expected(v)})"
            }
          }
          (expected.keySet -- present).foreach { v =>
            val loud =
              try { liveAt(v); false }
              catch { case _: Exception => true }
            if (!loud) {
              ok = false
              failure = s"$label: reclaimed v$v still readable"
            }
          }
        }

        val markerFile = java.nio.file.Path.of(
          StreamingUpsert.vacuumMarkerPath(dir).toUri.getPath)
        var staleMarker = false

        ops.foreach {
          case _ if !ok => ()
          case Merge(rows) =>
            // (mergeBatch is below the drain-level marker check by
            // design: the fuzz merge models a drain that acquired its
            // lease BEFORE the vacuum was killed)
            val id = nextId
            nextId += 1
            state = StreamingUpsert.mergeBatch(
              spark, state,
              rows.map(r => (r.k, r.v, r.seq, r.op)).toDF("k", "v", "__seq", "__op"),
              id, dir, "k", buckets = 2, tombstoneHorizon = Long.MaxValue)
            merged = merged ++ rows
            expected += (id -> lwwLive(merged))
            present += id
            check(s"after merge v$id")
          case Vacuum(retainLast) =>
            if (present.nonEmpty) {
              StreamingUpsert.vacuum(spark, dir, retainLast)
              // a completing vacuum supersedes and clears a stale marker
              if (staleMarker && java.nio.file.Files.exists(markerFile)) {
                ok = false
                failure = "vacuum completed but left the stale marker behind"
              }
              staleMarker = false
              val newest = present.toSeq.sorted.takeRight(retainLast).toSet
              val pinned = pins.map(_._2).toSet
              present = newest ++ (pinned & present)
              check(s"after vacuum($retainLast)")
            }
          case Pin(pick) =>
            if (present.nonEmpty) {
              val v = present.toSeq.sorted.apply(pick % present.size)
              if (staleMarker) {
                // acquisition must refuse while a (stale) marker exists,
                // name the recovery, and leave no pin file behind
                val thrown =
                  try { StreamingUpsert.pinVersion(spark, dir, v); None }
                  catch { case e: IllegalStateException => Some(e) }
                if (!thrown.exists(_.getMessage.contains("vacuum"))) {
                  ok = false
                  failure = s"pin v$v under stale marker: expected loud " +
                    s"vacuum refusal, got $thrown"
                }
                check(s"after refused pin v$v (stale marker)")
              } else {
                pins ::= (StreamingUpsert.pinVersion(spark, dir, v), v)
                check(s"after pin v$v")
              }
            }
          case Release(pick) =>
            if (pins.nonEmpty) {
              val idx = pick % pins.size
              val (h, v) = pins(idx)
              h.release(spark)
              pins = pins.patch(idx, Nil, 1)
              check(s"after release v$v")
            }
          case KillVacuum =>
            // the store dir may not exist yet (kill before first merge)
            java.nio.file.Files.createDirectories(markerFile.getParent)
            if (!java.nio.file.Files.exists(markerFile))
              java.nio.file.Files.createFile(markerFile)
            staleMarker = true
            check("after killed vacuum (stale marker planted)")
          case ClearMarker =>
            java.nio.file.Files.deleteIfExists(markerFile)
            staleMarker = false
            check("after operator cleared the stale marker")
        }
        // don't let a stale marker block the terminal sweep's pins
        java.nio.file.Files.deleteIfExists(markerFile)
        // terminal sweep: a latest-only vacuum with all pins released
        // must leave exactly the newest version (+ still-held pins)
        if (ok && present.nonEmpty) {
          pins.foreach(_._1.release(spark))
          pins = Nil
          StreamingUpsert.vacuum(spark, dir, retainLast = 1)
          present = Set(present.max)
          check("after terminal vacuum")
        }
        ok :| failure
      } finally deleteRecursively(root)
    }
}
