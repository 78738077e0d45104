package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The associativity contract of the foreachBatch upsert sink: with
  * tombstone retention, batch arrival order cannot change the final
  * snapshot — a high-sequence delete arriving BEFORE a low-sequence
  * upsert still deletes the key.
  */
class StreamingUpsertSpec extends AnyFunSuite with SparkTestSession {

  private def rows(t: (Long, Long, Long, String)*) = {
    import spark.implicits._
    t.toDF("k", "v", "__seq", "__op")
  }

  test("compact is order-independent: early tombstone beats late low-seq upsert") {
    val b1 = rows((1L, 0L, 10L, "delete"), (2L, 20L, 3L, "upsert"))
    val b2 = rows((1L, 99L, 5L, "upsert"), (2L, 21L, 4L, "upsert"))
    val empty = b1.limit(0)
    def live(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("__op") === "upsert")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ab = StreamingUpsert.compact(StreamingUpsert.compact(empty, b1, "k"), b2, "k")
    val ba = StreamingUpsert.compact(StreamingUpsert.compact(empty, b2, "k"), b1, "k")
    // key 1: delete@10 wins over upsert@5 in BOTH orders; key 2: seq 4
    assert(live(ab) == Map(2L -> 21L))
    assert(live(ba) == Map(2L -> 21L))
    // the tombstone itself is retained (not dropped) so a further
    // merge of an even later batch still sees it
    assert(ab.filter(col("k") === 1 && col("__op") === "delete").count() == 1L)
  }

  test("equal-sequence duplicate resolves deterministically: delete outranks upsert") {
    val b = rows((7L, 1L, 5L, "upsert"), (7L, 2L, 5L, "delete"))
    val out = StreamingUpsert.compact(b.limit(0), b, "k").collect()
    assert(out.length == 1 && out.head.getString(3) == "delete")
  }
}
