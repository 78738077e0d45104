package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unit coverage for the round-6 depth operators: Morton interleave,
  * dyadic EWMA, SCD2 interval builds, replicated joins, and exact
  * correlation. (Their end-to-end shapes are oracle-gated as
  * q101–q112; these pin the library semantics on controlled input.)
  */
class DeepOpsSpec extends AnyFunSuite with SparkTestSession {

  test("morton16 interleaves bits (reference implementation)") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.morton16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (x, y) => ref(x, y) })
  }

  test("z-order buckets bound both dimensions' ranges") {
    import spark.implicits._
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    // top 2 interleaved bit-pairs -> 16 buckets of a 64x64 grid: each
    // bucket must span at most a 16x16 tile in BOTH dimensions.
    val prof = ZOrder.layoutProfile(grid, col("x"), col("y"), bucketShift = 8)
      .collect()
    assert(prof.length == 16)
    assert(prof.forall { r =>
      r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 15 &&
        r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 15
    })
  }

  test("dyadic EWMA matches an iterative fold") {
    import spark.implicits._
    val rows = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 50L),
      (2L, 1L, 7L), (3L, 5L, 0L), (3L, 9L, 1024L))
    def ref(vs: Seq[Long]): Double =
      vs.tail.foldLeft(vs.head.toDouble)((s, x) => s / 2.0 + x / 2.0)
    val got = Ewma.dyadic(rows.toDF("k", "t", "v"), col("k"), col("t"), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3L, ref(Seq(100L, 200L, 50L)))))
    assert(got(2L) == ((1L, 7.0)))
    assert(got(3L) == ((2L, 512.0)))
  }

  test("SCD2 collapses runs into contiguous intervals, one current per key") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "a", 2L), (1L, 30L, "b", 3L),
      (1L, 40L, "a", 4L), (2L, 5L, "x", 5L))
      .toDF("k", "t", "a", "id")
    val out = Scd.type2(changes, col("k"), col("t"), col("a"), col("id"))
      .orderBy("k", "run").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getAs[String]("a"), r.getAs[Long]("valid_from"),
      Option(r.getAs[Any]("valid_to")), r.getAs[Long]("n_changes"))).toSeq ==
      Seq(("a", 10L, Some(30L), 2L), ("b", 30L, Some(40L), 1L),
        ("a", 40L, None, 1L)))
    // exactly one open (current) interval per key
    assert(out.groupBy(_.getLong(0)).forall {
      case (_, rs) => rs.count(_.getAs[Boolean]("is_current")) == 1
    })
  }

  test("replicated join equals plain join under skew") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => (1L, 1L)) ++ (1 to 100).map(i => (i.toLong % 7, i.toLong)))
      .toDF("fk", "row_id")
    val dim = (0L to 6L).map(k => (k, s"name$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewedAgg.replicatedJoin(fact, dim, col("fk"), col("dk"),
      salt = col("row_id"), buckets = 8)
      .groupBy("name").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("exact correlation hits the closed form on linear data") {
    import spark.implicits._
    val pos = (1L to 50L).map(i => ("p", i, 2 * i + 3))
    val neg = (1L to 50L).map(i => ("n", i, 100 - 5 * i))
    val flat = (1L to 50L).map(i => ("z", i, 42L)) // zero variance in y
    val out = Stats.corrE6((pos ++ neg ++ flat).toDF("g", "x", "y"),
      col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> Option(r.getAs[Any]("corr_e6"))).toMap
    assert(out("p").exists(v => math.abs(v.asInstanceOf[Long] - 1000000L) <= 1))
    assert(out("n").exists(v => math.abs(v.asInstanceOf[Long] + 1000000L) <= 1))
    assert(out("z").isEmpty) // guarded: no divide-by-zero row
  }
}
