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

  /** `events.parquet` has shipped `ts` in two encodings across driver
    * rounds, so the loader dispatches on the RESOLVED schema:
    *
    *  - INT64 TIMESTAMP(NANOS) (rounds ≤ 8): Spark cannot read nanos
    *    natively; `spark.sql.legacy.parquet.nanosAsLong` (set
    *    session-wide in [[GraftSession]]) maps it to LongType, and we
    *    convert to microseconds exactly the way DuckDB's reader
    *    truncates nanos → micros (integer division, no rounding).
    *  - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 9+):
    *    reads natively as TIMESTAMP_NTZ; cast to TimestampType under
    *    the session's pinned UTC zone — identical microsecond values,
    *    and downstream `unix_micros`/window code keeps one input type.
    *
    * Either way callers see a TimestampType `ts` with the same values
    * DuckDB reads, keeping oracle parity.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      // The driver regenerates testdata between rounds and its physical
      // encodings are NOT contract-stable (nanos→micros flipped in
      // round 9). A third encoding must fail HERE with its name — not
      // surface as confusing analysis errors or silently divergent
      // values three operators downstream (round-9 advice).
      case other => throw new IllegalStateException(
        s"events.ts has unhandled encoding $other; teach Tables.events " +
          "the new driver testdata type")
    }
  }

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
