package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator inventory (SURVEY §2.10 plus
  * the 100 TB extension operators); `oracleSql` carries the equivalent
  * DuckDB SQL for every SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query (driver smoke-checks rows>0): revenue per nation — a
    * 3-way fact join with broadcast dimensions, decimal-exact revenue.
    * Data dir is overridable via SPARK_GRAFT_ENTRY_DIR (defaults to the
    * driver's smoke-check scale factor).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_ENTRY_DIR", "/root/testdata/sf0.001")
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("line_count"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("revenue"))
      .orderBy(desc("revenue"))
  }

  private lazy val specs: Map[String, QuerySpec] =
    CoreQueries.specs ++ EtlQueries.specs ++ LlmQueries.specs ++
      ExtQueries.specs ++ OpsQueries.specs ++ ScaleQueries.specs ++
      DeepQueries.specs ++ FrontierQueries.specs ++ DecorrelationQueries.specs ++
      JoinShapeQueries.specs ++ SurfaceQueries.specs ++ AlgebraQueries.specs ++
      SketchQueries.specs ++ StatQueries.specs ++ PortabilityQueries.specs ++
      AllocationQueries.specs ++ TokenizerQueries.specs ++ EvalQueries.specs ++
      CorpusOpsQueries.specs ++ ProfileQueries.specs ++ RetrievalQueries.specs ++
      SignalQueries.specs ++ JourneyQueries.specs ++ FitEvalQueries.specs ++
      SegmentationQueries.specs ++ ConnectorQueries.specs ++
      AffinityQueries.specs ++ AssuranceQueries.specs ++
      TypedApiQueries.specs ++ VariantQueries.specs ++ Sql4Queries.specs ++
      StateInspectionQueries.specs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map { case (k, v) => k -> v.fn }

  def oracleSql: Map[String, String] =
    specs.collect { case (k, QuerySpec(_, Some(sql))) =>
      k -> sql.linesIterator.map(_.trim).mkString(" ").trim
    }
}
