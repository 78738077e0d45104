package graft.tools

import org.apache.spark.sql.functions._

import graft.etl.{PgConn, PgWireSink}
import graft.sources.LivePostgres

/** Live-plane scale probe (round-15 verdict #5): measured COPY-in and
  * partitioned COPY-out throughput against the scratch Postgres, 1 vs 4
  * partitions, across scale decades — the empirical row for the
  * SCALING.md probe table that the compute families already have. The
  * claim under test is connection-per-partition scaling: each Spark
  * partition COPYs over its own connection, so throughput should grow
  * with partitions until the single-node server's CPU saturates (on a
  * real cluster the server side is also parallel — this measures the
  * CLIENT plane's ability to feed it).
  *
  * Usage: `runMain graft.tools.CopyProbe <dir> [dir ...]` — e.g.
  * /root/testdata/sf0.1 localdata/sf1 localdata/sf2. Uses the orders
  * table (bigint keys, numeric, date-bearing text) with ledger=false
  * (pure COPY cost, no claim transaction) and a fresh target per
  * (dir, partitions) cell. Timing excludes server boot (LivePostgres
  * boots before any timer, the same protocol Bench uses).
  */
object CopyProbe {
  def main(args: Array[String]): Unit = {
    require(LivePostgres.available, "postgres server binaries not installed")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "localdata/sf1", "localdata/sf2")
    val spark = graft.GraftSession.get("copy-probe")
    val h = LivePostgres.get() // boot outside every timer
    val conn = PgConn(h.host, h.port, h.user, h.database)
    val sink = new PgWireSink(conn)
    sink.createSchema("graft_probe")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(f"${"dir"}%-22s ${"rows"}%10s  parts  ${"copy_in_s"}%9s ${"in_rows_s"}%10s  ${"copy_out_s"}%10s ${"out_rows_s"}%10s")
    dirs.foreach { dir =>
      val src = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(15,2)").as("o_totalprice"),
        col("o_orderpriority"))
      val rows = src.count()
      Seq(1, 4).foreach { parts =>
        val table = s"graft_probe.copy_${parts}p"
        sink.execute(s"""DROP TABLE IF EXISTS graft_probe."copy_${parts}p"""")
        sink.execute(
          s"""CREATE TABLE $table (
                o_orderkey BIGINT, o_custkey BIGINT,
                o_totalprice NUMERIC(15,2), o_orderpriority TEXT)""")
        val frame = src.repartition(parts, col("o_orderkey")).persist()
        val _ = frame.count() // materialize: time COPY, not the scan
        val inS = time {
          frame.write.format("graft.sources.PgWireSource")
            .option("host", h.host).option("port", h.port)
            .option("user", h.user).option("database", h.database)
            .option("table", table).option("ledger", "false")
            .mode("append").save()
        }
        frame.unpersist(blocking = true)
        val outS = time {
          spark.read.format("graft.sources.PgWireSource")
            .option("host", h.host).option("port", h.port)
            .option("user", h.user).option("database", h.database)
            .option("table", table)
            .option("partitionColumn", "o_orderkey")
            .option("numPartitions", parts.toString)
            .load()
            .write.mode("overwrite").format("noop").save()
        }
        println(f"$dir%-22s $rows%10d  $parts%5d  $inS%9.2f ${rows / inS}%10.0f  $outS%10.2f ${rows / outS}%10.0f")
      }
    }
    spark.stop()
  }
}
