package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-data-capture apply: merge an ordered changelog of
  * upserts/deletes into a base snapshot — the MERGE INTO / Delta
  * apply-changes primitive an incremental ETL refresh needs (the
  * reference re-loads whole collections per run; CDC apply is its
  * incremental counterpart).
  *
  * Semantics: the base snapshot acts as a sequence-0 upsert for every
  * key; the winning row per key is the one with the highest change
  * sequence (last-writer-wins), and a winning `delete` removes the key
  * from the output.
  *
  * Scale shape: ONE hash shuffle on the key (the union is map-side;
  * the per-key window keeps one row of state per key via
  * WindowGroupLimit's rank-1 pushdown). No driver-side state, no
  * collect — a 100 TB snapshot merges against an arbitrarily large
  * changelog with the same plan.
  */
object CdcMerge {

  val OpUpsert = "upsert"
  val OpDelete = "delete"

  /** Apply `changes` (keyCol, seqCol > 0, opCol in {upsert,delete},
    * payloadCols) onto `base` (keyCol, payloadCols). Returns the merged
    * snapshot: keyCol, payloadCols, plus `src_seq` — the winning change
    * sequence (0 = the row survives unchanged from the base).
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: Column,
      opCol: Column,
      payloadCols: Seq[String]): DataFrame = {
    val cols = Seq(col(keyCol)) ++ payloadCols.map(col)
    val b = base.select(cols: _*)
      .withColumn("__seq", lit(0L))
      .withColumn("__op", lit(OpUpsert))
    val c = changes.select(
      (cols :+ seqCol.cast("long").as("__seq") :+ opCol.as("__op")): _*)
    // Sequences are expected unique per key (CDC log order); if a
    // producer ever emits duplicates, the op tie-break makes resolution
    // DETERMINISTIC — delete outranks upsert at equal sequence — rather
    // than shuffle-order-dependent.
    val w = Window.partitionBy(keyCol).orderBy(col("__seq").desc, col("__op").asc)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") === OpUpsert)
      .select((cols :+ col("__seq").as("src_seq")): _*)
  }
}
