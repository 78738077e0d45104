package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import StreamingSessions._

class StreamingSessionsSpec extends AnyFunSuite with SparkTestSession {

  private val M = 1000000L // µs per second

  test("sessions survive microbatch boundaries: state carries the open session") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = sessionize(input.toDS(), gapSeconds = 60L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // batch 1: user 1 has two events 10s apart — one open session, nothing emitted
    input.addData(Ev(1L, 0L, 1L), Ev(1L, 10L * M, 2L))
    out.processAllAvailable()
    assert(spark.table("sess_out").count() == 0)

    // batch 2: 30s later (within gap) the session continues; then a 200s
    // jump closes it as (3 events, 0..40s) and opens session 2
    input.addData(Ev(1L, 40L * M, 3L), Ev(1L, 240L * M, 4L))
    out.processAllAvailable()
    val r = spark.table("sess_out").collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 3L
      && r(0).getLong(3) == 0L && r(0).getLong(4) == 40L * M)

    // batch 3: another user interleaves; keys never mix
    input.addData(Ev(2L, 0L, 5L), Ev(2L, 500L * M, 6L), Ev(1L, 500L * M, 7L))
    out.processAllAvailable()
    val byUser = spark.table("sess_out").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byUser == Map(1L -> 2, 2L -> 1))
    out.stop()
  }

  test("within-batch fold matches the batch operator's gap rule (strictly greater)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = sessionize(input.toDS(), gapSeconds = 60L)
      .writeStream.format("memory").queryName("sess_edge")
      .outputMode("append").start()
    // gap of exactly 60s does NOT split (batch rule is >); 61s does
    input.addData(Ev(9L, 0L, 1L), Ev(9L, 60L * M, 2L), Ev(9L, 121L * M, 3L))
    out.processAllAvailable()
    val r = spark.table("sess_edge").collect()
    assert(r.length == 1 && r(0).getLong(2) == 2L && r(0).getLong(4) == 60L * M)
    out.stop()
  }
}
