package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.sources.{BsonCodec, FakeMongoServer}
import BsonCodec._

/** Per-JVM fake-mongod fixtures for the S2 wire gates (q314/q315):
  * one [[FakeMongoServer]] per (name, sf-dir), seeded from the
  * deterministic `orders` table — the Mongo analog of
  * [[graft.sources.LivePostgres]]'s scratch-cluster singleton, so the
  * bench's repeated gate passes reuse the booted server instead of
  * re-seeding per pass. The driver-side collect is the HARNESS (an
  * in-memory server is inherently driver-fed), not the measured
  * dataflow — everything after `connect` runs the real wire path on
  * executors.
  */
object MongoFixtures {

  private val servers = new ConcurrentHashMap[(String, String), FakeMongoServer]()

  private def get(name: String, dir: String)(
      build: => Vector[BDoc]): FakeMongoServer =
    servers.computeIfAbsent((name, dir), _ => new FakeMongoServer(build))

  /** TYPED orders collection for the DSv2 scan gate (q314): every
    * inferred-kind family — int64 `_id`, int32, double, strings, bool,
    * datetime, a nested doc and an array (rendered kinds), and a
    * sometimes-missing field.
    */
  def ordersTyped(s: SparkSession, dir: String): FakeMongoServer =
    get("orders_typed", dir) {
      ordersRows(s, dir).map { case (k, cust, price, dateMs, pri, status) =>
        val base = Vector[(String, BsonValue)](
          "_id" -> BInt64(k),
          "cust" -> BInt32(cust.toInt),
          "price" -> BDouble(price),
          "pri" -> BString(pri),
          "status" -> BString(status),
          "even" -> BBool(k % 2 == 0),
          "odate" -> BDateTime(dateMs),
          "meta" -> BDoc("m" -> BInt32((k % 7).toInt)),
          "tags" -> BArray(Vector(BString(s"t${k % 5}"))))
        BDoc(base ++
          (if (k % 5 != 0) Vector[(String, BsonValue)](
            "comment" -> BString(s"note $k")) else Vector.empty))
      }
    }

  /** RAW-shaped orders collection for the end-to-end gate (q315): BSON
    * documents whose [[BsonCodec.toReferenceJson]] rendering carries
    * the SAME semantic payload as [[EtlQueries.rawOrdersDocs]]
    * (rotating date formats k%4, naive event_time, junk-amount k%7,
    * absent comment k%5, unmapped `mixed`), so the T1–T11 transform of
    * the wire-read corpus matches the q312 oracle computed from the
    * base columns. Not byte-identical to the string fixture — `total`
    * rides as a BSON double whose repr drops the trailing ".x0" — but
    * numerically identical through the numeric parse, which is what
    * the oracle compares.
    */
  def ordersRaw(s: SparkSession, dir: String): FakeMongoServer =
    get("orders_raw", dir) {
      val fmtUs = java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy")
      val fmtDmy = java.time.format.DateTimeFormatter.ofPattern("dd-MM-yyyy")
      val fmtYmd = java.time.format.DateTimeFormatter.ofPattern("yyyy/MM/dd")
      ordersRows(s, dir).map { case (k, _, price, dateMs, pri, _) =>
        val d = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(dateMs),
          java.time.ZoneOffset.UTC).toLocalDate
        val fd = (k % 4) match {
          case 0 => d.toString
          case 1 => d.format(fmtUs)
          case 2 => d.format(fmtDmy)
          case _ => d.format(fmtYmd)
        }
        val et = f"${d.toString}T${k % 24}%02d:${k % 60}%02d:${(k * 7) % 60}%02d"
        val amtDec = java.math.BigDecimal.valueOf(price)
          .setScale(2, java.math.RoundingMode.HALF_UP)
        val base = Vector[(String, BsonValue)](
          "_id" -> BInt64(k),
          "order_date" -> BString(fd),
          "event_time" -> BString(et),
          "total" -> BDouble(amtDec.doubleValue),
          "amount_str" -> BString(
            if (k % 7 == 0) "junk" else amtDec.toPlainString),
          "is_priority" -> BBool(k % 2 == 0),
          "priority" -> BString(pri),
          "mixed" -> BInt64(k)) // unmapped: dropped by T1 either way
        BDoc(base ++
          (if (k % 5 != 0) Vector[(String, BsonValue)](
            "comment" -> BString(s"note $k")) else Vector.empty))
      }
    }

  private def ordersRows(s: SparkSession, dir: String)
      : Vector[(Long, Long, Double, Long, String, String)] = {
    import org.apache.spark.sql.functions.col
    graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("timestamp"), col("o_orderpriority"),
        col("o_orderstatus"))
      .collect()
      .iterator
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).toInstant.toEpochMilli, r.getString(4),
        r.getString(5)))
      .toVector
  }
}
