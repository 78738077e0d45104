package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{CacheScope, SparkTestSession}

/** DistributedOrder = the monolithic window, bit for bit — plus the
  * plan-shape guarantee the operator exists for: no single-partition
  * WindowExec ever sees raw corpus rows (round-9 verdict on
  * q197/q198/q209). The only empty-partitionSpec window allowed in its
  * plans is the offsets tier, which runs ABOVE a per-bucket aggregate
  * (numShufflePartitions rows), and that is asserted structurally.
  */
class DistributedOrderSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def randomDocs(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // scores drawn from a small range so ties are common; ids unique
    (0 until n).map(i => (i.toLong, rnd.nextInt(40).toLong,
      if (rnd.nextBoolean()) "en" else "de"))
      .toDF("id", "score", "grp")
  }

  /** Every unpartitioned WindowExec must sit above an aggregate — i.e.
    * operate on the shrunken per-bucket tier, never the input rows.
    */
  private def assertNoCorpusGlobalWindow(df: DataFrame): Unit = {
    val plan = df.queryExecution.sparkPlan
    val offenders = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        w.child.collect { case a: BaseAggregateExec => a }.isEmpty => w
    }
    assert(offenders.isEmpty,
      s"unpartitioned WindowExec over raw rows:\n${offenders.mkString("\n")}")
  }

  private def collectWindows(df: DataFrame): Seq[WindowExec] =
    df.queryExecution.sparkPlan.collect { case w: WindowExec => w }

  test("global row_number matches the single-partition window bit for bit") {
    CacheScope.scoped {
      val df = randomDocs(3000, seed = 11)
      val got = DistributedOrder
        .withRowNumber(df, Seq(col("score").desc, col("id")), "r")
        .select("id", "r").as[(Long, Long)].collect().toMap
      val want = df.withColumn("r",
          row_number().over(Window.orderBy(col("score").desc, col("id"))))
        .select("id", "r").as[(Long, Int)].collect()
        .map { case (i, r) => i -> r.toLong }.toMap
      assert(got == want)
    }
  }

  test("per-group row_number matches the partitioned window bit for bit") {
    CacheScope.scoped {
      val df = randomDocs(2000, seed = 23)
      val got = DistributedOrder
        .withRowNumber(df, Seq(col("score"), col("id")), "r",
          partitionBy = Seq("grp"))
        .select("id", "r").as[(Long, Long)].collect().toMap
      val want = df.withColumn("r",
          row_number().over(
            Window.partitionBy("grp").orderBy(col("score"), col("id"))))
        .select("id", "r").as[(Long, Int)].collect()
        .map { case (i, r) => i -> r.toLong }.toMap
      assert(got == want)
    }
  }

  test("running sum matches the exclusive window frame bit for bit") {
    CacheScope.scoped {
      // aggregate ties away first (the q198 usage): per-score rows
      val per = randomDocs(2500, seed = 37)
        .groupBy("score").agg(count(lit(1)).as("cnt"))
      val got = DistributedOrder
        .withRunningSum(per, Seq(col("score")), col("cnt"), "before")
        .select("score", "before").as[(Long, Long)].collect().toMap
      val want = per.withColumn("before",
          coalesce(sum("cnt").over(Window.orderBy("score")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("score", "before").as[(Long, Long)].collect().toMap
      assert(got == want)
    }
  }

  test("running max matches the inclusive window frame bit for bit") {
    CacheScope.scoped {
      // values deliberately include negatives: a zero offset sentinel
      // for the first bucket would corrupt a negative-prefix max
      val rnd = new scala.util.Random(23)
      val df = (0 until 2500)
        .map(i => (i.toLong, rnd.nextInt(2000).toLong - 1000L))
        .toDF("id", "v")
      val got = DistributedOrder
        .withRunningMax(df, Seq(col("id")), col("v"), "m")
        .select("id", "m").as[(Long, Long)].collect().toMap
      val want = df.withColumn("m",
          max(col("v")).over(Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("id", "m").as[(Long, Long)].collect().toMap
      assert(got == want)
      assertNoCorpusGlobalWindow(
        DistributedOrder.withRunningMax(df, Seq(col("id")), col("v"), "m"))
    }
  }

  test("plan: no unpartitioned WindowExec over raw rows, offsets tier above an aggregate") {
    CacheScope.scoped {
      val df = randomDocs(1000, seed = 5)
      val ranked = DistributedOrder
        .withRowNumber(df, Seq(col("score"), col("id")), "r")
      assertNoCorpusGlobalWindow(ranked)
      // and the in-bucket window is genuinely partitioned
      assert(collectWindows(ranked).exists(_.partitionSpec.nonEmpty))
    }
  }

  test("plan: q197/q198/q209 gate shapes carry no corpus-wide global window") {
    CacheScope.scoped {
      val sf = "/root/testdata/sf0.001"
      for (q <- Seq("q197_decile_lift", "q198_auc", "q209_quantile_normalize")) {
        assertNoCorpusGlobalWindow(graft.SparkEntry.queries(q)(spark, sf))
      }
    }
  }
}
