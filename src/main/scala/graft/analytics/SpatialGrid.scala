package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial self-join: all point pairs within a radius,
  * without a cross join.
  *
  * Points land in square cells of side `cell ≥ radius`; every point is
  * replicated to its 3×3 cell neighborhood on the probe side and kept
  * in its own cell on the build side, so any pair within `radius` of
  * each other shares an equi-join key (cell). The join is a plain
  * shuffled equi-join on (cx, cy) — at 100 TB the cell key
  * distributes uniformly for non-pathological point sets, and a 9×
  * replication of one side is the fixed, bounded price for turning a
  * distance predicate into an equi-join. The exact distance filter
  * then prunes the candidate superset; `a < b` on the point id keeps
  * each unordered pair exactly once (each ordered pair arises once,
  * because the build side sits in exactly one cell).
  *
  * All coordinates are integers and the predicate compares SQUARED
  * distance — no floats anywhere, so results are bit-stable across
  * engines and partitionings.
  */
object SpatialGrid {

  /** Coordinates must be NONNEGATIVE: integer `div` truncates toward
    * zero, which would fold the cells straddling the origin (and SQL
    * engines disagree on negative integer division — Spark truncates,
    * DuckDB floors). Shift the frame before calling if needed.
    *
    * @param pts   (id, x, y) integer points
    * @param cell  grid cell side; must be ≥ radius or coverage breaks
    * @param radius pair distance threshold (inclusive, Euclidean)
    * @return (id_a, id_b, dist2) with id_a < id_b, dist2 = squared
    *         Euclidean distance ≤ radius²
    */
  def neighborPairs(pts: DataFrame, id: Column, x: Column, y: Column,
      cell: Long, radius: Long): DataFrame = {
    require(cell >= radius, s"cell ($cell) must be >= radius ($radius)")
    val p = pts.select(id.cast("long").as("id"),
      x.cast("long").as("x"), y.cast("long").as("y"))
    val offsets = Seq(-1L, 0L, 1L)
    val probe = p.select(
      col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      explode(array(offsets.flatMap(dx => offsets.map(dy =>
        struct(
          (expr(s"x div $cell") + dx).as("cx"),
          (expr(s"y div $cell") + dy).as("cy")))): _*)).as("c"))
      .select(col("id_a"), col("xa"), col("ya"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val build = p.select(
      col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      expr(s"x div $cell").as("cx"), expr(s"y div $cell").as("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b") && d2 <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
  }
}
