package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FrequentItemsSpec extends AnyFunSuite with SparkTestSession {

  private def summarize(items: Seq[String], capacity: Int, parts: Int)
      : Seq[(String, Long, Long)] = {
    import spark.implicits._
    items.toDF("item").repartition(parts).createOrReplaceTempView("fi_items")
    spark.sql(s"SELECT graft_frequent(item, $capacity) AS fi FROM fi_items")
      .select(explode(col("fi")).as("e")).select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("exact regime: counts exact, err zero, partitioning-invariant") {
    val items = (1 to 20).flatMap(i => Seq.fill(i)(f"w$i%02d"))
    for (parts <- Seq(1, 7)) {
      val out = summarize(scala.util.Random.shuffle(items), 64, parts)
      assert(out.size == 20)
      assert(out.forall(_._3 == 0L))
      val got = out.map(e => e._1 -> e._2).toMap
      (1 to 20).foreach(i => assert(got(f"w$i%02d") == i.toLong))
      // sorted (cnt desc, item asc)
      assert(out == out.sortBy(e => (-e._2, e._1)))
    }
  }

  test("approximate regime: SpaceSaving bounds hold under skew and merge") {
    // heavy hitters h1..h5 (1000 each) over a 500-item uniform tail
    // (10 each): N = 10000, capacity 16 => any item with true count
    // > N/16 = 625 MUST be present; every entry's true count must lie
    // in [cnt - err, cnt]
    val truth: Map[String, Long] =
      (1 to 5).map(i => s"h$i" -> 1000L).toMap ++
        (1 to 500).map(i => f"t$i%03d" -> 10L).toMap
    val items = truth.toSeq.flatMap { case (i, c) => Seq.fill(c.toInt)(i) }
    for (parts <- Seq(1, 5)) {
      val out = summarize(scala.util.Random.shuffle(items), 16, parts)
      assert(out.size <= 16)
      val present = out.map(_._1).toSet
      (1 to 5).foreach(i => assert(present(s"h$i"), s"missing heavy hitter h$i"))
      out.foreach { case (item, cnt, err) =>
        val t = truth(item)
        assert(t <= cnt && t >= cnt - err,
          s"$item: true=$t not in [${cnt - err}, $cnt]")
      }
    }
  }

  test("eviction is deterministic: single-partition rerun is identical") {
    val items = (1 to 50).map(i => f"x$i%02d") ++ (1 to 50).map(i => f"x$i%02d")
    val a = summarize(items, 8, 1)
    val b = summarize(items, 8, 1)
    assert(a == b)
  }
}
