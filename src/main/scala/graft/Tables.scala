package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (`TESTDATA.md`).
  *
  * Scale notes (100 TB design): every loader returns a plain scan — no
  * caching, no collect. Filters/projections applied by callers reach the
  * parquet reader via Catalyst pushdown. The only normalization done here
  * is the `events.ts` nanosecond→microsecond conversion, which stays
  * inside whole-stage codegen.
  */
object Tables {

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark
    * does not read natively; `spark.sql.legacy.parquet.nanosAsLong`
    * (set session-wide in [[GraftSession]]) maps it to LongType and we
    * convert to a microsecond timestamp exactly the way DuckDB's reader
    * truncates nanos → micros (integer division, no rounding), keeping
    * oracle parity.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
}
