package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: events of one user
  * belong to the same session while consecutive gaps stay under
  * `gapSeconds`. The standard two-window formulation — `lag` flags
  * session starts, a running `sum` numbers them — with BOTH windows
  * partitioned by user: state per key is one row, the only shuffle is
  * the hash partition on user_id, and no window ever sees more than
  * one user's events. (A global/unpartitioned window would be the
  * scale mistake here.)
  *
  * Timestamps are compared in epoch MICROSECONDS (exact longs) so the
  * gap predicate is engine-portable; ties on ts break by `eventId` for
  * a deterministic order.
  */
object EventSessions {

  def sessionize(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      eventIdCol: Column,
      gapSeconds: Long = 1800L): DataFrame = {
    val perUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val flagged = events
      .select(userCol.as("user_id"), unix_micros(tsCol).as("ts_us"),
        eventIdCol.as("event_id"))
      .withColumn("__prev", lag("ts_us", 1).over(perUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("ts_us") - col("__prev") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum("__new").over(perUser))
    flagged.groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        max("ts_us").as("end_us"))
  }
}
