package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.PgWireClient

/** Serializable connection descriptor for the wire-protocol plane —
  * shipped to executors, each of which opens its own connection (the
  * same connection-per-partition shape Spark's JDBC writer uses).
  */
final case class PgConn(host: String, port: Int, user: String,
    database: String, password: String = "") extends Serializable {
  def open(): PgWireClient =
    PgWireClient.connect(host, port, user, database, password,
      // deterministic text rendering regardless of server defaults
      params = Map("TimeZone" -> "UTC", "DateStyle" -> "ISO"))
}

/** K1 over the wire protocol: a [[TableSink]] whose append streams COPY
  * text rows partition-parallel into a live PostgreSQL — the loader the
  * reference implements as one INSERT per document on one connection
  * (`etl_pipeline/postgres_loader.py:63-77`), re-expressed as Spark's
  * execution model wants it: every partition COPYs its rows over its
  * own connection concurrently, batched into 64 KiB wire chunks.
  *
  * COPY-vs-INSERT is the 100 TB decision, not a convenience: COPY
  * bypasses per-statement parse/plan and is the documented PostgreSQL
  * bulk path, and partition-parallelism multiplies it by the cluster's
  * cores. DDL (K2/K3) goes through one driver-side connection exactly
  * like [[JdbcPostgresSink]].
  *
  * Typed values ride as COPY text: Spark's cast-to-string rendering for
  * dates/timestamps/booleans/decimals is accepted by Postgres' input
  * functions, array columns land as JSON text into JSONB targets (the
  * same convention as the other sinks).
  *
  * Task-retry semantics match Spark's own JDBC writer: each partition's
  * COPY runs in its own implicit transaction, so a task that dies
  * mid-stream disconnects and Postgres rolls the partial COPY back —
  * the retry starts clean. The residual at-least-once window (a task
  * dying AFTER its COPY commits but before reporting success) is the
  * same one `write.jdbc` has; [[appendExactlyOnce]] closes it with a
  * ledger-arbitrated commit when the caller can supply a stable batch
  * id (plain [[append]] keeps the JDBC-writer contract for ad-hoc
  * loads with no ledger side table).
  */
final class PgWireSink(conn: PgConn) extends TableSink {

  HostGuard.requireLocal(conn.host) // F5

  private def withClient[A](f: PgWireClient => A): A = {
    val c = conn.open()
    try f(c) finally c.close()
  }

  private def quoted(tableName: String): String = {
    val (schema, table) = SchemaScript.splitTableName(tableName)
    "\"" + schema.replace("\"", "\"\"") + "\".\"" +
      table.replace("\"", "\"\"") + "\""
  }

  override def tableExists(tableName: String): Boolean = {
    val (schema, table) = SchemaScript.splitTableName(tableName)
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    withClient(_.query(
      s"""SELECT 1 FROM information_schema.tables
          WHERE table_schema = ${lit(schema)} AND table_name = ${lit(table)}""")
      .rows.nonEmpty)
  }

  override def createSchema(schemaName: String): Unit =
    withClient { c =>
      val _ = c.query(SchemaManager.createSchemaSql(schemaName))
    }

  override def createTable(tableName: String, columns: Seq[ColumnDef]): Unit =
    withClient { c =>
      val _ = c.query(SchemaManager.createTableSql(tableName, columns))
    }

  /** Convenience for gates/tests: run one simple statement driver-side. */
  def execute(sql: String): Unit = withClient { c => val _ = c.query(sql) }

  override def append(df: DataFrame, tableName: String): Unit = {
    // Stringify inside the plan (codegen'd) so executors only escape and
    // frame bytes: arrays → JSON text (JSONB convention shared with the
    // parquet/JDBC sinks), everything else → Spark's cast-to-string.
    val stringified = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }.toSeq: _*)
    val cols = stringified.schema.fieldNames.toSeq
    val colList = cols.map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(", ")
    val copySql = s"COPY ${quoted(tableName)} ($colList) FROM STDIN"
    val cn = conn
    val width = cols.length
    stringified.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val client = cn.open()
        try {
          val _ = client.copyIn(copySql, rows.map { r =>
            val vs = new Array[String](width)
            var i = 0
            while (i < width) { vs(i) = r.getString(i); i += 1 }
            PgWireClient.encodeCopyRow(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(vs))
          })
        } finally client.close()
      }
    }
  }

  /** Drop ledger entries older than `olderThanDays` — the retention
    * companion to [[appendExactlyOnce]] (the ledger otherwise grows by
    * one row per partition per batch forever). Only vacuum past the
    * re-delivery horizon: a vacuumed batch id that is later re-run
    * re-opens its dedup window and appends again. Returns the number of
    * rows dropped.
    */
  def vacuumLedger(olderThanDays: Int,
      ledgerTable: String = "graft_meta.copy_ledger"): Long =
    withClient { c =>
      if (!tableExists(ledgerTable)) 0L
      else {
        val r = c.query(
          s"""DELETE FROM ${quoted(ledgerTable)}
              WHERE committed_at < now() - interval '$olderThanDays days'""")
        // CommandComplete tag is "DELETE <n>"
        r.tags.lastOption.map(_.split(" ").last.toLong).getOrElse(0L)
      }
    }

  /** Exactly-once append: closes [[append]]'s residual at-least-once
    * window (a task re-run AFTER its COPY committed — stage retry on
    * fetch failure, speculation, a lost success report) by making
    * Postgres itself the commit arbiter. Each partition runs
    *
    * {{{ BEGIN; INSERT INTO <ledger>(batch_id, partition_id); COPY …;
    *     UPDATE <ledger> SET n_rows = <n>; COMMIT }}}
    *
    * with `PRIMARY KEY (batch_id, partition_id)` on the ledger, so:
    *   - a duplicate attempt hits unique_violation (23505) on the
    *     INSERT — before streaming any data — and returns as a no-op;
    *   - a CONCURRENT duplicate (speculation) blocks on the first
    *     attempt's uncommitted ledger row and resolves to 23505 or a
    *     clean run depending on whether the first commits or aborts;
    *   - a task that dies mid-COPY aborts its transaction, deleting
    *     its ledger row with it — the retry starts clean.
    *
    * The same protocol shape as the DSv2 commit coordinator, but the
    * arbiter is the target database, so it also holds across JOB
    * re-runs: pass a caller-stable `batchId` (a Structured Streaming
    * `foreachBatch` epoch id, an orchestrator run key) and a
    * re-delivered batch dedupes per partition — PROVIDED the frame's
    * partition contents are deterministic (same plan over same input;
    * repartition by a key column, not round-robin, if in doubt).
    */
  def appendExactlyOnce(df: DataFrame, tableName: String, batchId: String,
      ledgerTable: String = "graft_meta.copy_ledger"): Unit = {
    val (ledgerSchema, _) = SchemaScript.splitTableName(ledgerTable)
    withClient { c =>
      val _ = c.query(SchemaManager.createSchemaSql(ledgerSchema))
      val _2 = c.query(
        s"""CREATE TABLE IF NOT EXISTS ${quoted(ledgerTable)} (
              batch_id TEXT NOT NULL,
              partition_id INT NOT NULL,
              n_rows BIGINT,
              committed_at TIMESTAMPTZ NOT NULL DEFAULT now(),
              PRIMARY KEY (batch_id, partition_id))""")
    }
    val stringified = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }.toSeq: _*)
    val cols = stringified.schema.fieldNames.toSeq
    val colList = cols.map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(", ")
    val copySql = s"COPY ${quoted(tableName)} ($colList) FROM STDIN"
    val ledger = quoted(ledgerTable)
    val batchLit = "'" + batchId.replace("'", "''") + "'"
    val cn = conn
    val width = cols.length
    stringified.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val client = cn.open()
        try {
          val claimed =
            try {
              val _ = client.query(
                s"""BEGIN;
                    INSERT INTO $ledger (batch_id, partition_id)
                    VALUES ($batchLit, $pid)""")
              true
            } catch {
              case e: PgWireClient.PgServerException if e.sqlState == "23505" =>
                // Another attempt of THIS (batch, partition) already
                // committed — this attempt is the duplicate; succeed
                // without sending a row.
                val _ = client.query("ROLLBACK")
                false
            }
          if (claimed) {
            val n = client.copyIn(copySql, rows.map { r =>
              val vs = new Array[String](width)
              var i = 0
              while (i < width) { vs(i) = r.getString(i); i += 1 }
              PgWireClient.encodeCopyRow(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(vs))
            })
            val _ = client.query(
              s"""UPDATE $ledger SET n_rows = $n
                  WHERE batch_id = $batchLit AND partition_id = $pid;
                  COMMIT""")
          }
        } finally client.close()
      }
    }
  }
}

object PgWireSink {

  /** Partition-parallel read-back over COPY TO STDOUT: one SELECT per
    * partition (the caller supplies disjoint predicates — hash-mod of a
    * key, range bounds), each partition COPYing its slice over its own
    * connection. Values come back as text; the caller casts. This is
    * the wire-level analog of `spark.read.jdbc(..., predicates, ...)`.
    */
  def readPartitioned(spark: SparkSession, conn: PgConn,
      partitionSqls: Seq[String], columns: Seq[String]): DataFrame = {
    require(partitionSqls.nonEmpty, "at least one partition SQL required")
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    val cn = conn
    val rdd = spark.sparkContext
      .parallelize(partitionSqls, partitionSqls.size)
      .flatMap { q =>
        val client = cn.open()
        try client.copyOutLines(s"COPY ($q) TO STDOUT")
          .map(l => Row.fromSeq(PgWireClient.decodeCopyRow(l).toIndexedSeq))
        finally client.close()
      }
    spark.createDataFrame(rdd, schema)
  }
}
