package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-level entry to the NATIVE as-of join
  * ([[graft.plans.GraftAsOfJoin]] / `GraftAsOfJoinExec`): same
  * signature and output schema as [[AsOfJoin.asOf]] — every left row,
  * enriched with `asof_<payload>` columns from the most recent right
  * row of the same key at-or-before the left timestamp (ties among
  * right rows at one timestamp: greatest id wins) — so the two
  * implementations are drop-in interchangeable and gate each other
  * (q148 runs this one against q46's oracle).
  *
  * Plan difference, not semantics: the union+window form pays one
  * combined shuffle + window over left ∪ right; this one shuffles each
  * side separately on the key and MERGES in a single forward pass with
  * one retained row of state (see `AsOfJoinExec.scala`). Requires the
  * session to carry `GraftExtensions` (as every [[graft.GraftSession]]
  * does); without it the marker fails analysis loudly.
  */
object AsOfJoinNative {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      payloadCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    val anchor = Seq(keyCol, tsCol, idCol)
    val leftExtra = left.columns.filterNot(anchor.contains).toSeq
    // rename the right side so the join output has no duplicate names;
    // project it down to exactly what the operator needs — the custom
    // node is opaque to column pruning, so pruning happens here
    val rCols = (anchor ++ payloadCols).distinct
    val r = right.select(rCols.map(c => col(c).as(s"__r_$c")): _*)
    val tolLit = toleranceUs
      .map(t => lit(t)).getOrElse(lit(null).cast("bigint"))
    val joined = left.join(r,
      col(keyCol) === col(s"__r_$keyCol") &&
        call_function("graft_asof_marker",
          col(tsCol), col(s"__r_$tsCol"), col(s"__r_$idCol"), tolLit))
    joined.select(
      (anchor ++ leftExtra).map(col) ++
        payloadCols.map(c => col(s"__r_$c").as(s"asof_$c")): _*)
  }
}
