package graft.analytics

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Property-based check of the distributed CDC apply against a
  * driver-side sequential replay on random changelogs — the invariant
  * of MERGE semantics: for every key, the highest-sequence operation
  * decides (upsert's value survives, delete removes the key), with the
  * base snapshot acting as sequence 0.
  */
object CdcPropertySpec extends Properties("CdcProperties") {

  private lazy val spark = SparkTestSession.session

  private case class Change(k: Long, v: String, seq: Long, op: String)

  private val caseGen: Gen[(List[(Long, String)], List[Change])] = for {
    nKeys <- Gen.choose(1, 12)
    baseKeys <- Gen.someOf(0L until nKeys.toLong)
    nCh <- Gen.choose(0, 30)
    raw <- Gen.listOfN(nCh, for {
      k <- Gen.choose(0L, nKeys.toLong - 1)
      v <- Gen.alphaStr.map(s => "v" + s.take(4))
      op <- Gen.oneOf(CdcMerge.OpUpsert, CdcMerge.OpDelete)
    } yield (k, v, op))
  } yield {
    val base = baseKeys.toList.map(k => (k, s"base$k"))
    // unique, positive sequences in arrival order
    val changes = raw.zipWithIndex.map { case ((k, v, op), i) =>
      Change(k, if (op == CdcMerge.OpDelete) null else v, i + 1L, op)
    }
    (base, changes)
  }

  private def replay(
      base: List[(Long, String)],
      changes: List[Change]): Map[Long, (String, Long)] =
    changes.sortBy(_.seq).foldLeft(
      base.map { case (k, v) => k -> (v, 0L) }.toMap) { (state, c) =>
      c.op match {
        case CdcMerge.OpUpsert => state + (c.k -> (c.v, c.seq))
        case _ => state - c.k
      }
    }

  property("distributed merge equals sequential replay") =
    forAll(caseGen) { case (base, changes) =>
      import spark.implicits._
      val baseDf = base.toDF("k", "v")
      val chDf = changes.map(c => (c.k, c.v, c.seq, c.op)).toDF("k", "v", "seq", "op")
      val got = CdcMerge.applyChanges(baseDf, chDf, "k", col("seq"), col("op"), Seq("v"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      got == replay(base, changes)
    }
}
