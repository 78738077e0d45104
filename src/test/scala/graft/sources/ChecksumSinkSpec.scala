package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ChecksumSinkSpec extends AnyFunSuite with SparkTestSession {

  test("commit publishes the merged digest across partitions") {
    import spark.implicits._
    ChecksumSink.clear("t1")
    val vals = (1L to 10000L)
    vals.toDF("v").repartition(7)
      .write.format("graft.sources.ChecksumSink")
      .option("tag", "t1").mode("append").save()
    val d = ChecksumSink.result("t1").getOrElse(fail("nothing committed"))
    assert(d.rows === 10000L)
    assert(d.sum === vals.sum)
    assert(d.xor === vals.reduce(_ ^ _))
  }

  test("a failing job publishes NOTHING (abort path)") {
    import spark.implicits._
    ChecksumSink.clear("t2")
    val boom = udf { v: Long =>
      if (v == 5000L) throw new RuntimeException("planted failure"); v
    }
    intercept[Exception] {
      (1L to 10000L).toDF("v").repartition(4)
        .select(boom(col("v")).as("v"))
        .write.format("graft.sources.ChecksumSink")
        .option("tag", "t2").mode("append").save()
    }
    assert(ChecksumSink.result("t2").isEmpty,
      "aborted job leaked a committed digest")
  }

  test("rejects a write that is not one BIGINT column at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "v")
        .write.format("graft.sources.ChecksumSink")
        .option("tag", "t3").mode("append").save()
    }
    // Spark's output resolution enforces the declared 1-column schema
    assert(e.getMessage.toLowerCase.contains("too many data columns"))
  }

  test("read-then-write roundtrip: RangeSource digest matches closed form") {
    ChecksumSink.clear("t4")
    spark.read.format("graft.sources.RangeSource")
      .option("start", 0).option("end", 100000).option("slices", 8)
      .load()
      .filter(col("id") < 1000)
      .select(col("id").as("v")) // the sink resolves by name
      .write.format("graft.sources.ChecksumSink")
      .option("tag", "t4").mode("append").save()
    val d = ChecksumSink.result("t4").getOrElse(fail("nothing committed"))
    assert(d.rows === 1000L)
    assert(d.sum === (0L until 1000L).sum)
  }
}
