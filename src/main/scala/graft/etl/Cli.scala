package graft.etl

import graft.GraftSession

/** Batch CLI — the reference's entry contract
  * (`etl_pipeline/cli.py:8-32`): input envelope + app config + mapping
  * config, run once, print the report summary.
  *
  * Usage:
  *   runMain graft.etl.Cli --input in.json --app-config app.yaml \
  *     --mapping-config mapping.yaml [--parquet-sink DIR | --sink pgwire]
  *
  * With `--parquet-sink` the run writes parquet tables under DIR
  * (local/test mode). `--sink pgwire` targets Postgres per the app
  * config's database section over the built-in wire-protocol client
  * (partition-parallel COPY — no JDBC driver jar needed; q312's live
  * path). Default targets Postgres via Spark JDBC (requires the
  * driver on the classpath).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    val input = opts.getOrElse("input", sys.error("--input required"))
    val appPath = opts.getOrElse("app-config", sys.error("--app-config required"))
    val mappingPath = opts.getOrElse("mapping-config", sys.error("--mapping-config required"))

    val app = EtlConfig.appConfig(EtlConfig.loadRaw(appPath))
    val mapping = EtlConfig.mappingConfig(EtlConfig.loadRaw(mappingPath))
    EtlConfig.validateMappingTypes(mapping, app.runtime.typeMappings)

    val spark = GraftSession.get("graft-etl")
    val sink: TableSink = opts.get("parquet-sink") match {
      case Some(dir) => new ParquetSink(dir)
      case None if opts.get("sink").contains("pgwire") =>
        new PgWireSink(PgConn(app.database.host, app.database.port,
          app.database.user, app.database.name, app.database.password))
      case None =>
        val s = new JdbcPostgresSink(app.database)
        s.ensureDatabase() // K3: fresh deployment → CREATE DATABASE first
        s
    }
    val result = Pipeline.run(spark, Ingestion.loadEnvelope(spark, input), app, mapping, sink)

    // log_summary analog (reporting.py:36-95), derived from the result frames
    println(s"ETL Summary")
    println(s"Ingestion date: ${result.ingestionDate}")
    def fmt(s: Set[String]) = if (s.isEmpty) "None" else s.toSeq.sorted.mkString(", ")
    println(s"Missing collections: ${fmt(result.missingCollections)}")
    println(s"Unmapped collections: ${fmt(result.unmappedCollections)}")
    println(s"Missing tables in schema.sql: ${fmt(result.missingTablesInput)}")
    println(s"Missing tables in database: ${fmt(result.missingTablesDb)}")
    result.objectStatuses.toSeq.sorted.foreach { case (name, status) =>
      println(s"  - $name: $status")
    }
    result.counters.foreach { c =>
      println(f"${"Collection"}%-20s ${"Processed"}%9s ${"Errors"}%7s ${"InsertFail"}%11s")
      c.orderBy("collection").collect().foreach { r =>
        println(f"${r.getString(0)}%-20s ${r.getLong(1)}%9d ${r.getLong(2)}%7d ${r.getLong(3)}%11d")
      }
    }
    spark.stop()
  }
}
