package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * Sorting a table by the Morton code of two filter columns clusters
  * rows so that BOTH columns' min/max ranges per file stay narrow —
  * the layout trick behind multi-column data skipping (a linear sort
  * keeps only the leading column's ranges tight). At 100 TB this is a
  * one-off `repartitionByRange(zvalue).sortWithinPartitions` at write
  * time that pays back on every selective scan of either column.
  *
  * The interleave is unrolled into a 32-term integer expression — no
  * lambda, so it stays inside whole-stage codegen, and the arithmetic
  * (`shift`/`and`/`multiply`/`add` on 64-bit integers) is exact in any
  * engine.
  */
object ZOrder {

  /** 32-bit Morton code of the low 16 bits of two nonnegative longs:
    * bit i of x lands at bit 2i, bit i of y at bit 2i+1.
    */
  def morton16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Per-bucket layout profile after Z-ordering: assign each row the
    * Morton code of (x, y), bucket by the code's high bits (one bucket
    * ≈ one file), and report both dimensions' min/max spread per
    * bucket — the data-skipping effectiveness a reader would see.
    */
  def layoutProfile(
      df: DataFrame,
      x: Column,
      y: Column,
      bucketShift: Int): DataFrame =
    df.select(x.as("x"), y.as("y"))
      .withColumn("z", morton16(col("x"), col("y")))
      .withColumn("zbucket", shiftright(col("z"), bucketShift))
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("cnt"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
}
