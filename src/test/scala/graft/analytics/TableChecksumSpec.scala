package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TableChecksumSpec extends AnyFunSuite with SparkTestSession {

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableChecksum.fingerprint(
      df, Seq(col("k").cast("string"), col("v")), Seq.empty)
      .collect().head

  test("fingerprint is invariant under row order and partitioning") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, s"v$i"))
    val a = fp(rows.toDF("k", "v").repartition(1))
    val b = fp(scala.util.Random.shuffle(rows).toDF("k", "v").repartition(7))
    assert(a == b)
  }

  test("fingerprint detects a changed row, a duplicate, and a doubled pair") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toLong, s"v$i"))
    val base = fp(rows.toDF("k", "v"))
    val changed = fp(rows.updated(41, (42L, "vX")).toDF("k", "v"))
    assert(base != changed)
    // one duplicated row: xor cancels the pair, the sum does not —
    // the reason the triple carries both combiners
    val dup = fp((rows :+ rows.head).toDF("k", "v"))
    assert(base.getAs[Long]("fp_xor") != dup.getAs[Long]("fp_xor"))
    val doubled = fp((rows ++ rows.take(2)).toDF("k", "v"))
    assert(base.getAs[java.math.BigDecimal]("fp_sum")
      != doubled.getAs[java.math.BigDecimal]("fp_sum"))
    assert(base.getAs[Long]("n_rows") != doubled.getAs[Long]("n_rows"))
  }
}
