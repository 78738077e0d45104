package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EventSessionsSpec extends AnyFunSuite with SparkTestSession {

  test("sessions split on gaps > threshold, per user, inclusive bounds") {
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    def ts(sec: Long) = new java.sql.Timestamp(base / 1000 + sec * 1000)
    val events = Seq(
      // user 1: two sessions — 3 events within gaps, then a 2000s gap
      (1L, ts(0), 100L), (1L, ts(100), 101L), (1L, ts(1800), 102L),
      (1L, ts(3900), 103L),
      // user 2: one session; exact-gap boundary (1800s) stays together
      (2L, ts(0), 200L), (2L, ts(1800), 201L))
      .toDF("user_id", "ts", "event_id")
    val r = EventSessions.sessionize(
      events, col("user_id"), col("ts"), col("event_id"), gapSeconds = 1800L)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // user1: session1 = 3 events (gap 1700s ≤ 1800 keeps 102), session2 = 1
    // user2: single session (gap == 1800 is NOT a split)
    assert(r.toList == List((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 2L)))
  }
}
