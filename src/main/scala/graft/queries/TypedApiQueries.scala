package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 session-4 typed-API surface: the Dataset operators a
  * case-class-first codebase builds on — typed cogroup (q291) and a
  * user-level typed Aggregator (q292). Both are gated against plain
  * SQL oracles: the typed plan must produce exactly the relational
  * answer.
  */
object TypedApiQueries {

  /** Exact per-key stats as a typed Aggregator: (count, sum, min, max)
    * over BIGINT cents in one buffer. The user-level sibling of the
    * repo's Catalyst TypedImperativeAggregates — declared with
    * encoders, merged associatively, usable via `.toColumn` or
    * `udaf()`.
    */
  final case class Stats(n: Long, sum: Long, mn: Long, mx: Long)

  object CentsStats extends Aggregator[Long, Stats, Stats] {
    override def zero: Stats = Stats(0L, 0L, Long.MaxValue, Long.MinValue)
    override def reduce(b: Stats, v: Long): Stats =
      Stats(b.n + 1, b.sum + v, math.min(b.mn, v), math.max(b.mx, v))
    override def merge(a: Stats, b: Stats): Stats =
      if (a.n == 0) b else if (b.n == 0) a
      else Stats(a.n + b.n, a.sum + b.sum,
        math.min(a.mn, b.mn), math.max(a.mx, b.mx))
    override def finish(r: Stats): Stats = r
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  val specs: Map[String, QuerySpec] = Map(

    // Q291: typed COGROUP — per-key merge of two Datasets without
    // materializing a join: both sides shuffle once on the key and the
    // merge function sees the two groups side by side. Here the
    // customer's order history and event stream are stitched into one
    // activity profile (order count + cents, event count + floor-value
    // sum, and which side has any rows). The oracle is the relational
    // equivalent: a full-outer join of two rollups — the typed plan
    // must reproduce it exactly, including keys present on only one
    // side.
    "q291_typed_cogroup" -> QuerySpec(
      (s, dir) => {
        import s.implicits._
        val orders = Tables.orders(s, dir)
          .select(col("o_custkey").as("k"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .as[(Long, Long)]
        val events = Tables.events(s, dir)
          .select(col("user_id").as("k"),
            expr("CAST(floor(value) AS BIGINT)").as("v"))
          .as[(Long, Long)]
        orders.groupByKey(_._1)
          .cogroup(events.groupByKey(_._1)) { (k, os, es) =>
            var on = 0L; var oc = 0L
            os.foreach { o => on += 1; oc += o._2 }
            var en = 0L; var ev = 0L
            es.foreach { e => en += 1; ev += e._2 }
            val side =
              if (on > 0 && en > 0) "both"
              else if (on > 0) "orders_only" else "events_only"
            Iterator((k, on, oc, en, ev, side))
          }
          .toDF("k", "n_orders", "order_cents", "n_events", "event_vsum",
            "side")
          .groupBy("side")
          .agg(count(lit(1)).as("n_keys"),
            sum("n_orders").cast("long").as("n_orders"),
            sum("order_cents").cast("long").as("order_cents"),
            sum("n_events").cast("long").as("n_events"),
            sum("event_vsum").cast("long").as("event_vsum"))
          .orderBy("side")
      },
      """WITH o AS (SELECT o_custkey AS k,
                           CAST(count(*) AS BIGINT) AS n_orders,
                           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                AS BIGINT) AS order_cents
                    FROM orders GROUP BY 1),
         e AS (SELECT user_id AS k,
                      CAST(count(*) AS BIGINT) AS n_events,
                      CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT)
                        AS event_vsum
               FROM events GROUP BY 1),
         m AS (SELECT coalesce(o.k, e.k) AS k,
                      coalesce(o.n_orders, 0) AS n_orders,
                      coalesce(o.order_cents, 0) AS order_cents,
                      coalesce(e.n_events, 0) AS n_events,
                      coalesce(e.event_vsum, 0) AS event_vsum,
                      CASE WHEN o.k IS NOT NULL AND e.k IS NOT NULL
                             THEN 'both'
                           WHEN o.k IS NOT NULL THEN 'orders_only'
                           ELSE 'events_only' END AS side
               FROM o FULL JOIN e ON o.k = e.k)
         SELECT side, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(n_orders) AS BIGINT) AS n_orders,
                CAST(sum(order_cents) AS BIGINT) AS order_cents,
                CAST(sum(n_events) AS BIGINT) AS n_events,
                CAST(sum(event_vsum) AS BIGINT) AS event_vsum
         FROM m GROUP BY 1 ORDER BY side"""),

    // Q292: user-level typed Aggregator — the `Aggregator[IN, BUF,
    // OUT]` API registered through `udaf()` and called from SQL: one
    // buffer carries count/sum/min/max and merges associatively, so
    // the aggregation is map-side-combinable exactly like a built-in.
    // The oracle computes the same four figures relationally.
    "q292_typed_aggregator" -> QuerySpec(
      (s, dir) => {
        s.udf.register("g_q292_stats",
          org.apache.spark.sql.functions.udaf(CentsStats))
        Tables.orders(s, dir).createOrReplaceTempView("g_q292_orders")
        s.sql("""
          WITH agg AS (SELECT o_orderpriority AS priority,
                              g_q292_stats(
                                CAST(round(o_totalprice * 100) AS BIGINT))
                                AS st
                       FROM g_q292_orders GROUP BY 1)
          SELECT priority, CAST(st.n AS BIGINT) AS n,
                 CAST(st.sum AS BIGINT) AS sum_cents,
                 CAST(st.mn AS BIGINT) AS min_cents,
                 CAST(st.mx AS BIGINT) AS max_cents
          FROM agg ORDER BY priority""")
      },
      """SELECT o_orderpriority AS priority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_cents,
                CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS min_cents,
                CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS max_cents
         FROM orders GROUP BY 1 ORDER BY priority""")
  )
}
