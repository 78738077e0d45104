package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row of
  * the same key at-or-before the left row's timestamp.
  *
  * Spark has no native as-of operator, and the naive formulations are
  * both scale-killers: a theta-join (`l.key = r.key AND r.ts <= l.ts`
  * then max-per-left) explodes to the full per-key cross product, and a
  * correlated subquery re-scans the right side per left row. The
  * scale-correct plan is the union+window formulation used here:
  *
  *   1. tag right rows 0 and left rows 1, union them on (key, ts, tag, id)
  *   2. ONE hash shuffle on the key + one in-partition sort
  *   3. a running `last(right_payload, ignoreNulls)` over
  *      (key ORDER BY ts, tag, id ROWS UNBOUNDED PRECEDING..CURRENT)
  *      carries "the most recent right row seen so far" to every left row
  *   4. keep tag=1 rows
  *
  * Cost is that of a single groupBy on the key — no range explosion, no
  * per-key state beyond one running struct, and skewed keys are handled
  * by the same AQE machinery as any other shuffle. Right rows sort
  * before left rows at equal timestamps (tag 0 < 1), so the match
  * predicate is `right.ts <= left.ts`; ties among right rows at one
  * timestamp break deterministically by the id column (latest id wins).
  *
  * Timestamps are compared as epoch-microsecond longs supplied by the
  * caller, keeping the ordering engine-exact (see EventSessions).
  */
object AsOfJoin {

  /** @param left  rows to enrich; must contain `keyCol`, `tsCol`, `idCol`
    * @param right rows to look up; same three columns required
    * @param payloadCols right-side columns to carry onto each left row,
    *        emitted as `asof_<name>` (null when no right row precedes)
    * @param toleranceUs optional max lookback (µs): a match older than
    *        `left ts − toleranceUs` is discarded (null-extended), the
    *        pandas `merge_asof(tolerance=…)` bound. Implemented as a
    *        second running window over the matched right row's ts plus
    *        a post-filter — the window plan itself is unchanged.
    *
    * Every other left column rides along unchanged (packed into a
    * struct through the union so the two sides stay schema-compatible).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      payloadCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    toleranceUs.foreach(t =>
      require(t >= 0, s"toleranceUs must be >= 0, got $t"))
    val anchor = Seq(keyCol, tsCol, idCol)
    val leftExtra = left.columns.filterNot(anchor.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val leftStruct =
      if (leftExtra.isEmpty) lit(null).cast("struct<__none:int>")
      else struct(leftExtra.map(col): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), col(idCol), lit(1).as("__tag"),
        leftStruct.as("__l")): _*)
    val rTagged = right.select(
      col(keyCol), col(tsCol), col(idCol), lit(0).as("__tag"),
      lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
      payload.as("__r"))
    val lTagged2 = lTagged.withColumn("__r",
      lit(null).cast(rTagged.schema("__r").dataType))
    val w = Window.partitionBy(keyCol).orderBy(tsCol, "__tag", idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRight = last(col("__r"), ignoreNulls = true).over(w)
    val withMatch = rTagged.unionByName(lTagged2)
      .withColumn("__m", matchedRight)
    val bounded = toleranceUs match {
      case None => withMatch
      case Some(t) =>
        // ts of the matched right row rides the same running last (null
        // exactly when __m is null), so the bound is one conditional
        withMatch
          .withColumn("__mts", last(when(col("__tag") === 0, col(tsCol)),
            ignoreNulls = true).over(w))
          .withColumn("__m",
            when(col(tsCol) - col("__mts") <= t, col("__m")))
    }
    bounded
      .filter(col("__tag") === 1)
      .select(
        Seq(col(keyCol), col(tsCol), col(idCol)) ++
          leftExtra.map(c => col(s"__l.$c").as(c)) ++
          payloadCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
