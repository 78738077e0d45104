package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.ChecksumSink

/** Round-10 session-4 connector-pushdown surface: the DataSource V2
  * range connector's aggregate pushdown (q260) and ORDER-BY-id TopN
  * pushdown (q261). Together with q213 (filter + pruning) and q252
  * (streaming leg) they pin the full V2 pushdown contract an
  * Iceberg/Delta/JDBC source lives by.
  */
object ConnectorQueries {

  /** Expected typed output of the full reference pipeline over the
    * orders fixture — shared by q312 (library-sink round trip) and
    * q315 (Mongo-wire read → T1–T11 transform → DSv2 write): both
    * landings must re-read to the same rows, computed here from the
    * base columns with the fixture's own arithmetic.
    */
  private[queries] val roundTripOracle: String = EtlQueries.docSql + """
         SELECT CAST(k AS INTEGER) AS order_id,
                strftime(d,'%Y-%m-%d') AS order_date,
                et AS event_ts,
                CAST(amt_dec AS DOUBLE) AS amount,
                CASE WHEN k%7=0 THEN NULL ELSE CAST(amt_dec AS DOUBLE) END AS amount2,
                (k%2=0) AS is_priority,
                pri AS priority_label,
                CASE WHEN k%5=0 THEN NULL ELSE 'note '||CAST(k AS VARCHAR) END AS comment,
                CAST(k AS INTEGER) AS raw_id,
                CASE WHEN k%7=0 THEN 'error' ELSE 'success' END AS status,
                CAST(CASE WHEN k%5=0 THEN 2 ELSE 1 END AS BIGINT) AS n_missing
         FROM doc ORDER BY order_id"""

  val specs: Map[String, QuerySpec] = Map(

    // Q260: aggregate PUSHDOWN through the V2 connector
    // (`SupportsPushDownAggregates`): the grouped count/sum/min/max
    // over `id` is evaluated inside the source in CLOSED FORM — each
    // slice emits at most 16 residue-class partial rows (an arithmetic
    // progression per group: O(1) math, zero row materialization) and
    // Spark re-aggregates the partials. At 100 TB the scan moves
    // kilobytes upward instead of the interval. RangeSourceSpec
    // asserts the plan shape (partial schema at the scan, pushdown
    // composes with the id-range filter) and bit-equality against an
    // unpushed generator; this gate pins the values against the
    // external oracle.
    "q260_dsv2_agg_pushdown" -> QuerySpec(
      (s, dir) => {
        s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 100000).option("slices", 7)
          .load()
          .filter(col("id") >= 25000 && col("id") < 90000)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("id").as("sum_id"),
            min("id").as("min_id"), max("id").as("max_id"))
          .orderBy("bucket")
      },
      """WITH r AS (SELECT unnest(generate_series(25000, 89999)) AS id)
         SELECT id % 16 AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(id) AS BIGINT) AS sum_id,
                CAST(min(id) AS BIGINT) AS min_id,
                CAST(max(id) AS BIGINT) AS max_id
         FROM r GROUP BY 1 ORDER BY bucket"""),

    // Q261: ORDER BY id LIMIT k pushes as TopN
    // (`SupportsPushDownTopN`): ids ascend within a partition, so the
    // source truncates the interval itself and plans ONE partition —
    // the k-row answer without generating (or sorting) the interval.
    // The same builder declines descending orders and falls back to
    // Spark's TakeOrdered (RangeSourceSpec pins both paths); the gate
    // also pins a pushed plain LIMIT via the deterministic aggregate
    // over its 12-row result.
    "q261_dsv2_topn_pushdown" -> QuerySpec(
      (s, dir) => {
        val src = s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 10000000).option("slices", 8)
          .load()
        val topn = src.filter(col("id") > 1234)
          .select(col("id"), col("id_sq"), col("label"))
          .orderBy("id").limit(7)
        val limited = src.limit(12)
          .agg(count(lit(1)).as("id_sq"), min(col("id")).as("id"))
          .withColumn("label", lit("limit12"))
          .select(col("id"), col("id_sq"), col("label"))
        topn.unionByName(limited).orderBy("id", "label")
      },
      """WITH t AS (SELECT unnest(generate_series(1235, 1241)) AS id),
           l AS (SELECT unnest(generate_series(0, 11)) AS id)
         SELECT id, id * id AS id_sq,
                'b' || CAST(id % 16 AS VARCHAR) AS label
         FROM t
         UNION ALL
         SELECT CAST(min(id) AS BIGINT) AS id,
                CAST(count(*) AS BIGINT) AS id_sq,
                'limit12' AS label
         FROM l
         ORDER BY id, label"""),

    // Q268: RUNTIME filtering (`SupportsRuntimeFiltering`) — the DPP
    // contract for V2 sources: the scan declares `id` runtime-
    // filterable, Spark materializes the (selective, broadcast) dim
    // side first and hands the scan the join keys' IN-set at EXECUTION
    // time, and the scan narrows to the keys' envelope before planning
    // partitions — a 2M-id interval collapses to the ≤1000-id band the
    // keys live in. Envelope pruning is a sound superset (the join
    // still filters row-level), which is exactly how partition-grained
    // DPP composes with exact join semantics on Iceberg/Delta.
    // RangeSourceSpec asserts the executed scan planned the narrowed
    // band; this gate pins the values.
    "q268_dsv2_runtime_filter" -> QuerySpec(
      (s, dir) => {
        val big = s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 2000000).option("slices", 8)
          .load()
        val dim = graft.Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(pmod(col("o_orderkey"), lit(1000L)).as("id"))
          .distinct()
        big.join(broadcast(dim), "id")
          .agg(count(lit(1)).as("n"), sum("id_sq").as("sum_sq"),
            min("id").as("min_id"), max("id").as("max_id"))
      },
      """WITH keys AS (SELECT DISTINCT o_orderkey % 1000 AS id
                       FROM orders WHERE o_orderpriority = '1-URGENT'),
           r AS (SELECT unnest(generate_series(0, 1999999)) AS id)
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(id * id) AS BIGINT) AS sum_sq,
                CAST(min(id) AS BIGINT) AS min_id,
                CAST(max(id) AS BIGINT) AS max_id
         FROM r JOIN keys USING (id)"""),

    // Q269: STORAGE-PARTITIONED JOIN (`SupportsReportPartitioning` +
    // `HasPartitionKey`): both scans report
    // KeyGroupedPartitioning(identity(bucket), 16) and plan one
    // partition per residue class, so the per-bucket aggregates AND
    // the join between them run with ZERO exchanges
    // (RangeSourceSpec asserts countShuffles == 0) — the layout
    // provides the clustering, exactly how Iceberg/Delta SPJ removes
    // the dominant shuffle from fact-fact joins at 100 TB. sum(id_sq)
    // is deliberately outside the agg-pushdown surface so the raw
    // key-grouped scan (not a partial-agg scan) is what the planner
    // sees.
    "q269_dsv2_storage_partitioned_join" -> QuerySpec(
      (s, dir) => {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        def bucketed(start: Long, end: Long) =
          s.read.format("graft.sources.RangeSource")
            .option("start", start).option("end", end)
            .option("partitionByBucket", "true")
            .load()
        val a = bucketed(0, 40000).groupBy("bucket")
          .agg(sum("id_sq").as("sq1"), count(lit(1)).as("n1"))
        val b = bucketed(10000, 90000).groupBy("bucket")
          .agg(sum("id_sq").as("sq2"), count(lit(1)).as("n2"))
        a.join(b, "bucket")
          .select(col("bucket"), col("sq1"), col("n1").cast("long").as("n1"),
            col("sq2"), col("n2").cast("long").as("n2"))
          .orderBy("bucket")
      },
      """WITH r1 AS (SELECT unnest(generate_series(0, 39999)) AS id),
           r2 AS (SELECT unnest(generate_series(10000, 89999)) AS id),
           a AS (SELECT id % 16 AS bucket,
                        CAST(sum(id * id) AS BIGINT) AS sq1,
                        CAST(count(*) AS BIGINT) AS n1
                 FROM r1 GROUP BY 1),
           b AS (SELECT id % 16 AS bucket,
                        CAST(sum(id * id) AS BIGINT) AS sq2,
                        CAST(count(*) AS BIGINT) AS n2
                 FROM r2 GROUP BY 1)
         SELECT a.bucket AS bucket, sq1, n1, sq2, n2
         FROM a JOIN b USING (bucket) ORDER BY bucket"""),

    // Q270: statistics-driven broadcast (`SupportsReportStatistics`):
    // the scan reports exact post-pushdown row counts, so Catalyst's
    // JoinSelection broadcasts the 50-id side WITHOUT a hint
    // (RangeSourceSpec asserts BroadcastHashJoin appears unhinted).
    // At 100 TB this is the difference between "the engineer
    // remembered broadcast()" and "the planner knew" — connector
    // stats make the right plan the default one.
    "q270_dsv2_stats_broadcast" -> QuerySpec(
      (s, dir) => {
        val big = s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 3000000).option("slices", 8)
          .load()
        val small = s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 3000000).option("slices", 2)
          .load()
          .filter(col("id") >= 1000 && col("id") < 1050)
          .select(col("id"), col("label").as("small_label"))
        big.join(small, "id")
          .groupBy("small_label")
          .agg(count(lit(1)).as("n"), sum("id_sq").as("sum_sq"))
          .orderBy("small_label")
      },
      """WITH r AS (SELECT unnest(generate_series(1000, 1049)) AS id)
         SELECT 'b' || CAST(id % 16 AS VARCHAR) AS small_label,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(id * id) AS BIGINT) AS sum_sq
         FROM r GROUP BY 1 ORDER BY small_label"""),

    // Q271: VECTORIZED read path (`supportColumnarReads` +
    // ColumnarBatch): the scan delivers 4096-row on-heap column
    // vectors into whole-stage codegen's ColumnarToRow boundary — the
    // execution shape of the vectorized parquet reader, demonstrated
    // from a custom connector. Same relation as the row path
    // (RangeSourceSpec pins row/columnar equality and the batch-edge
    // arithmetic); this gate pins the values through a filtered
    // aggregate. Per-batch amortization is the 100 TB point: one
    // virtual call per 4096 rows, not per row.
    "q271_dsv2_columnar_scan" -> QuerySpec(
      (s, dir) => {
        s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 500000).option("slices", 8)
          .option("columnarBatch", "true")
          .load()
          .filter(col("id") >= 12345 && col("id") < 480000)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("id_sq").as("sum_sq"))
          .orderBy("bucket")
      },
      """WITH r AS (SELECT unnest(generate_series(12345, 479999)) AS id)
         SELECT id % 16 AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(id * id) AS BIGINT) AS sum_sq
         FROM r GROUP BY 1 ORDER BY bucket"""),

    // Q276: parquet FOOTER-STATS aggregate pushdown
    // (spark.sql.parquet.aggregatePushdown): an unfiltered
    // MIN/MAX/COUNT answers from row-group statistics in the file
    // footers — zero data pages decoded. At 100 TB this turns "what's
    // the date range of this table" from a full scan into a
    // metadata-only read. The conf is set inside the gate (a
    // driver-built session can't drop it); the spec asserts
    // PushedAggregation reaches the scan node.
    "q276_parquet_footer_agg" -> QuerySpec(
      (s, dir) => {
        // footer aggregates live on the V2 parquet ScanBuilder, so the
        // gate flips parquet off the V1 list for ITS OWN eager read
        // (materialized inside the conf window — plans are lazy and the
        // driver acts on the returned frame later) and restores both
        // confs before returning
        val prevV1 = s.conf.get("spark.sql.sources.useV1SourceList")
        s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        s.conf.set("spark.sql.sources.useV1SourceList",
          prevV1.split(",").map(_.trim)
            .filterNot(v => v == "parquet" || v.isEmpty).mkString(","))
        try {
          val r = s.read.parquet(s"$dir/lineitem.parquet")
            .agg(count(lit(1)).as("n"),
              min("l_orderkey").as("min_key"),
              max("l_orderkey").as("max_key"),
              min("l_quantity").as("min_qty"),
              max("l_quantity").as("max_qty"))
            .select(col("n"), col("min_key"), col("max_key"),
              floor(col("min_qty")).cast("long").as("min_qty_l"),
              floor(col("max_qty")).cast("long").as("max_qty_l"))
            .head()
          s.createDataFrame(Seq((r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4))))
            .toDF("n", "min_key", "max_key", "min_qty_l", "max_qty_l")
        } finally {
          s.conf.set("spark.sql.parquet.aggregatePushdown", "false")
          s.conf.set("spark.sql.sources.useV1SourceList", prevV1)
        }
      },
      """SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(min(l_orderkey) AS BIGINT) AS min_key,
                CAST(max(l_orderkey) AS BIGINT) AS max_key,
                CAST(floor(min(l_quantity)) AS BIGINT) AS min_qty_l,
                CAST(floor(max(l_quantity)) AS BIGINT) AS max_qty_l
         FROM lineitem"""),

    // Q284: V2 CATALOG plugin (`TableCatalog`) — connector tables as
    // first-class SQL citizens: CREATE TABLE against the in-repo
    // catalog, then plain SQL over the catalog-qualified name, with
    // the ScanBuilder's whole pushdown stack (here: id-range filter +
    // aggregate partials) flowing through catalog resolution
    // unchanged. This is the plug-in seam Iceberg/Delta live behind
    // (spark.sql.catalog.<name>=<impl>); GraftCatalogSpec pins the
    // DDL lifecycle (create/alter/rename/drop, duplicate rejection).
    "q284_dsv2_catalog_sql" -> QuerySpec(
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
        s.sql("""CREATE TABLE IF NOT EXISTS graft_cat.ns.q284_range
                 (id BIGINT, id_sq BIGINT, bucket BIGINT, label STRING)
                 TBLPROPERTIES('start'='0', 'end'='60000', 'slices'='6')""")
        s.sql("""
          SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(id) AS BIGINT) AS sum_id,
                 CAST(min(id) AS BIGINT) AS min_id
          FROM graft_cat.ns.q284_range
          WHERE id >= 15000 AND id < 45000
          GROUP BY 1 ORDER BY bucket""")
      },
      """WITH r AS (SELECT unnest(generate_series(15000, 44999)) AS id)
         SELECT id % 16 AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(id) AS BIGINT) AS sum_id,
                CAST(min(id) AS BIGINT) AS min_id
         FROM r GROUP BY 1 ORDER BY bucket"""),

    // Q285: V2 FUNCTION catalog (`FunctionCatalog` + bound
    // `ScalarFunction` with the MAGIC static-shaped invoke(Long)):
    // Catalyst compiles graft_cat.ns.residue16(k) to a direct method
    // invocation inside codegen — no InternalRow boxing — which is the
    // performance contract that makes catalog UDFs usable in a 100 TB
    // hot path. The function IS the range table's bucketing key, so
    // SQL can group on exactly the layout the SPJ partitions use.
    "q285_dsv2_function_catalog" -> QuerySpec(
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
        graft.Tables.orders(s, dir).createOrReplaceTempView("g_q285_orders")
        s.sql("""
          SELECT graft_cat.ns.residue16(o_orderkey) AS bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM g_q285_orders
          GROUP BY 1 ORDER BY bucket""")
      },
      """SELECT o_orderkey % 16 AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders GROUP BY 1 ORDER BY bucket"""),

    // Q286: write-side distribution contract
    // (`RequiresDistributionAndOrdering`): the SINK declares "clustered
    // by k, sorted (k, v), exactly 5 partitions" and Spark plans the
    // exchange + sort to deliver it — the layout arrives because the
    // writer asked, not because the caller remembered
    // repartition().sortWithinPartitions(). The writer VERIFIES at
    // write time (out-of-order rows fail the task → 2PC abort →
    // nothing published; the driver commit re-checks key
    // disjointness), so the published digest existing at all proves
    // the engine honored the contract; the oracle pins its value.
    "q286_dsv2_write_distribution" -> QuerySpec(
      (s, dir) => {
        val tag = "q286-" + Integer.toHexString(dir.hashCode)
        ChecksumSink.clear(tag)
        graft.Tables.orders(s, dir)
          .select(pmod(col("o_custkey"), lit(32L)).as("k"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
          .write.format("graft.sources.ChecksumSink")
          .option("tag", tag).option("clusterByK", "true")
          .option("numPartitions", "5")
          .mode("append").save()
        val d = ChecksumSink.result(tag).getOrElse(
          sys.error("clustered write published nothing"))
        s.createDataFrame(Seq((d.rows, d.sum, d.xor)))
          .toDF("n_rows", "sum_cents", "xor_cents")
      },
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents,
                CAST(bit_xor(cents) AS BIGINT) AS xor_cents
         FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders)"""),

    // Q287: hidden FILE METADATA columns (`_metadata`) — per-row
    // provenance on file sources without a real column: which file a
    // row came from rides the scan for free and joins into any audit.
    // At 100 TB this is how "which input file poisoned this
    // aggregate" is answerable without re-ingesting lineage.
    "q287_file_metadata_column" -> QuerySpec(
      (s, dir) => {
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("_metadata.file_name").as("file_name"),
            col("l_quantity"))
          .groupBy("file_name")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("qty"))
          .orderBy("file_name")
      },
      """SELECT 'lineitem.parquet' AS file_name,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem"""),

    // Q288: connector METADATA columns (`SupportsMetadataColumns`) —
    // the same provenance idea exposed from the V2 source: `_slice` is
    // the planned-partition ordinal, hidden unless selected, emitted
    // by the readers on demand. The oracle reproduces the planner's
    // base/remainder slice arithmetic exactly, so the gate pins BOTH
    // the metadata plumbing and the documented partition-planning
    // contract.
    "q288_dsv2_metadata_column" -> QuerySpec(
      (s, dir) => {
        s.read.format("graft.sources.RangeSource")
          .option("start", 0).option("end", 12347).option("slices", 5)
          .load()
          .select(col("_slice"), col("id"))
          .groupBy("_slice")
          .agg(count(lit(1)).as("n"), min("id").as("min_id"),
            max("id").as("max_id"))
          .select(col("_slice").as("slice"), col("n"),
            col("min_id"), col("max_id"))
          .orderBy("slice")
      },
      """WITH s AS (SELECT unnest(generate_series(0, 4)) AS slice),
           b AS (SELECT slice,
                        slice * 2469 + LEAST(slice, 2) AS lo,
                        (slice + 1) * 2469 + LEAST(slice + 1, 2) AS hi
                 FROM s)
         SELECT CAST(slice AS BIGINT) AS slice,
                CAST(hi - lo AS BIGINT) AS n,
                CAST(lo AS BIGINT) AS min_id,
                CAST(hi - 1 AS BIGINT) AS max_id
         FROM b ORDER BY slice"""),

    // Q296: V2 FUNCTION catalog — the AGGREGATE leg
    // (`connector.catalog.functions.AggregateFunction`, the q285
    // scalar leg's big sibling): the catalog publishes a mergeable
    // aggregation that Spark plans with real partial/merge stages, so
    // the exchange carries one 8-byte XOR state per (group, partition)
    // instead of rows — the property that makes a catalog-published
    // aggregate usable over 100 TB. XOR is the repo's order-
    // independent digest primitive (the ChecksumSink commit protocol),
    // and DuckDB's bit_xor is its oracle twin. Grouped by the
    // catalog's own scalar residue16 so one statement exercises both
    // function kinds through catalog resolution.
    "q296_dsv2_catalog_aggregate" -> QuerySpec(
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
        graft.Tables.orders(s, dir).createOrReplaceTempView("g_q296_orders")
        s.sql("""
          SELECT graft_cat.ns.residue16(o_orderkey) AS bucket,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(graft_cat.ns.xor_digest(
                        CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS xor_cents
          FROM g_q296_orders
          GROUP BY 1 ORDER BY bucket""")
      },
      """SELECT o_orderkey % 16 AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                CAST(bit_xor(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS xor_cents
         FROM orders GROUP BY 1 ORDER BY bucket"""),

    // Q312 (round-15: the carried live-connector item, Postgres half):
    // a REAL database round-trip. The container ships PostgreSQL 15
    // server binaries (still no JDBC driver jar, and no Mongo server/
    // connector — that half stays environment-blocked on q308's
    // byte-exact normalization proxy), so the gate boots a scratch
    // cluster (LivePostgres), then runs the reference's core path
    // against it end to end:
    //   fixture docs → transformCollection (T1–T11) →
    //   K2 DDL through the real Postgres grammar →
    //   BOTH output planes COPY'd in partition-parallel over the
    //   wire-protocol client (PgWireSink, no JDBC driver) →
    //   read back via a PG-side JOIN of target × audit plane over
    //   4 disjoint COPY TO STDOUT partitions →
    //   row-level typed compare against the DuckDB oracle computed
    //   from the base columns.
    // What the landed-then-reread values prove that q309's parquet
    // double cannot: DATE/TIMESTAMPTZ/NUMERIC/BOOLEAN/JSONB all pass
    // through Postgres' input+output functions (raw_id comes out of
    // the landed JSONB document, n_missing out of the landed JSONB
    // audit array) — the full `postgres_loader.py` contract against a
    // live server. amount/amount2 ride as float8 per the q11 decimal-
    // representation convention.
    "q312_pg_live_roundtrip" -> QuerySpec(
      (s, dir) => {
        import graft.etl._
        import graft.sources.LivePostgres
        val h = LivePostgres.get()
        val conn = PgConn(h.host, h.port, h.user, h.database)
        val sink = new PgWireSink(conn)
        val cm = EtlQueries.ordersMapping
        val audit = EtlDefaults.audit

        // K2/K3 DDL against the real grammar; idempotent per bench pass.
        sink.execute("DROP TABLE IF EXISTS \"public\".\"orders_t\"")
        sink.execute(s"DROP TABLE IF EXISTS ${lit2(audit.auditTable)}")
        sink.createSchema(audit.auditSchema)
        sink.createTable(cm.targetTable, SchemaManager.buildTableColumns(
          cm, EtlDefaults.runtime.typeMappings,
          audit.businessColumns.toSeq, audit.businessColumnTypes))
        sink.createTable(audit.auditTable,
          SchemaManager.buildAuditTableColumns(audit))

        val tc = Transform.transformCollection(
          EtlQueries.rawOrdersDocs(s, dir), "raw", "orders", cm,
          EtlDefaults.runtime, audit,
          clock = to_timestamp(lit("2024-01-01 00:00:00")))
        // Same persist contract as Pipeline.run/q309: one parse+cast
        // pass feeds both plane writes.
        tc.shared.persist()
        try {
          sink.append(tc.target, cm.targetTable)
          sink.append(tc.audit, audit.auditTable)
        } finally tc.shared.unpersist(blocking = false)

        // Read back through a live PG join of the two landed planes,
        // partitioned over 4 disjoint key slices (the wire analog of
        // predicate-partitioned spark.read.jdbc).
        val parts = (0 until 4).map(i =>
          s"""SELECT t.order_id::text,
                     to_char(t.order_date, 'YYYY-MM-DD'),
                     to_char(t.event_ts AT TIME ZONE 'UTC',
                             'YYYY-MM-DD"T"HH24:MI:SS'),
                     t.amount::float8::text,
                     t.amount2::float8::text,
                     t.is_priority::text,
                     t.priority_label,
                     t.comment,
                     (t.raw_json->>'_id')::int::text,
                     t.status,
                     jsonb_array_length(a.missing_columns)::text
              FROM public.orders_t t
              JOIN doc_audit.ingestion_audit a
                ON a.object_id = t.order_id::text
              WHERE t.order_id % 4 = $i""")
        PgWireSink.readPartitioned(s, conn, parts,
          Seq("order_id", "order_date", "event_ts", "amount", "amount2",
            "is_priority", "priority_label", "comment", "raw_id",
            "status", "n_missing"))
          .select(
            col("order_id").cast("int").as("order_id"),
            col("order_date"), col("event_ts"),
            col("amount").cast("double").as("amount"),
            col("amount2").cast("double").as("amount2"),
            (col("is_priority") === "true").as("is_priority"),
            col("priority_label"), col("comment"),
            col("raw_id").cast("int").as("raw_id"),
            col("status"),
            col("n_missing").cast("long").as("n_missing"))
          .orderBy("order_id")
      },
      ConnectorQueries.roundTripOracle),

    // Q313 (round-16, r15 verdict #2): the DSv2 WRITE half of the wire
    // connector — `df.write.format(...).mode("append").save()` drives
    // the ledger-arbitrated COPY protocol through Spark's commit
    // coordinator (PgWireWrite), where q312 appends via the library
    // sink. The gate writes the typed frame TWICE with the same stable
    // batchId: the second job is the redelivery/re-run case and every
    // partition claim must no-op — a dedup failure doubles the rows
    // and breaks the row-level oracle, so exactly-once is what the
    // hash check certifies. Read-back goes through the DSv2 READ path
    // range-partitioned on the key (null-keeping first slice,
    // unbounded last slice), so one gate pins both planes of the
    // connector plus DATE/NUMERIC/BOOLEAN/JSONB round-trips under
    // `postgres_loader.py`'s typed-landing contract
    // (reference: etl_pipeline/postgres_loader.py:63-77).
    "q313_pg_dsv2_write" -> QuerySpec(
      (s, dir) => {
        import graft.etl._
        import graft.sources.LivePostgres
        val h = LivePostgres.get()
        val conn = PgConn(h.host, h.port, h.user, h.database)
        val sink = new PgWireSink(conn)
        sink.execute("DROP TABLE IF EXISTS \"public\".\"orders_dsv2\"")
        sink.execute(
          """CREATE TABLE public.orders_dsv2 (
               o_orderkey BIGINT NOT NULL, o_custkey BIGINT,
               o_totalprice NUMERIC(15,2), o_orderdate DATE,
               o_orderpriority TEXT, is_even BOOLEAN, flags JSONB)""")
        // Re-runnable in one JVM (bench sweeps re-enter the gate): the
        // target table was just dropped, so retire this gate's ledger
        // claims too or the re-run would no-op into the empty table.
        if (sink.tableExists("graft_meta.copy_ledger"))
          sink.execute(
            "DELETE FROM graft_meta.copy_ledger WHERE batch_id = 'q313-a'")

        val src = graft.Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(15,2)").as("o_totalprice"),
          to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"),
          (col("o_orderkey") % 2 === 0).as("is_even"),
          array(col("o_orderkey") % 3, col("o_orderkey") % 7).as("flags"))
          // key-hash partitioning: slice contents are deterministic
          // across re-runs, the precondition for ledger dedup
          .repartition(4, col("o_orderkey"))

        def write(): Unit = src.write.format("graft.sources.PgWireSource")
          .option("host", h.host).option("port", h.port)
          .option("user", h.user).option("database", h.database)
          .option("table", "public.orders_dsv2")
          .option("batchId", "q313-a")
          .mode("append").save()
        write()
        write() // the redelivered job: claims hit 23505, zero new rows

        s.read.format("graft.sources.PgWireSource")
          .option("host", h.host).option("port", h.port)
          .option("user", h.user).option("database", h.database)
          .option("table", "public.orders_dsv2")
          .option("partitionColumn", "o_orderkey")
          .option("numPartitions", "4")
          .load()
          .filter(col("o_orderkey") % 97 === 0)
          .select(
            col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_orderpriority"), col("is_even"),
            get_json_object(col("flags"), "$[0]").cast("long").as("flag0"))
          .orderBy("o_orderkey")
      },
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                CAST(o_custkey AS BIGINT) AS o_custkey,
                CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
                o_orderpriority,
                (o_orderkey % 2 = 0) AS is_even,
                CAST(o_orderkey % 3 AS BIGINT) AS flag0
         FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey"""),

    // Q314 (round-17, r16 verdict #1): the Mongo wire read through the
    // STANDARD DSv2 surface — `spark.read.format(...)` against the
    // promoted fake mongod (MongoFixtures: a per-JVM server seeded
    // from the deterministic orders table; the wire path from connect
    // to BSON decode is the real one, on executors). The scan infers
    // the typed schema from a 200-doc sample (every kind family:
    // int64 _id, int32, double, string, bool, datetime, rendered
    // doc/array, sometimes-missing field), pushes the pri/even
    // equality filters and the 7-column projection into the find
    // command (MongoWireSourceSpec asserts both in the server's
    // command log), and plans 4 stride-only _id-range slices. The
    // oracle recomputes every column — including the rendered-JSON
    // forms of the nested doc and array — from the base table.
    "q314_mongo_dsv2_read" -> QuerySpec(
      (s, dir) => {
        val srv = MongoFixtures.ordersTyped(s, dir)
        s.read.format("graft.sources.MongoWireSource")
          .option("host", "127.0.0.1").option("port", srv.port)
          .option("database", "db").option("collection", "orders_typed")
          .option("numPartitions", "4")
          .load()
          .filter(col("pri") === "1-URGENT" && col("even") === true)
          .select(
            col("_id").as("order_id"),
            col("cust"),
            col("price"),
            date_format(col("odate"), "yyyy-MM-dd'T'HH:mm:ss").as("odate_s"),
            col("meta"),
            col("tags"),
            col("comment"))
          .orderBy("order_id")
      },
      """SELECT o_orderkey AS order_id,
                CAST(o_custkey AS INTEGER) AS cust,
                o_totalprice AS price,
                strftime(CAST(o_orderdate AS TIMESTAMP),'%Y-%m-%dT%H:%M:%S') AS odate_s,
                '{"m":'||CAST(o_orderkey%7 AS VARCHAR)||'}' AS meta,
                '["t'||CAST(o_orderkey%5 AS VARCHAR)||'"]' AS tags,
                CASE WHEN o_orderkey%5=0 THEN NULL
                     ELSE 'note '||CAST(o_orderkey AS VARCHAR) END AS comment
         FROM orders
         WHERE o_orderpriority='1-URGENT' AND o_orderkey%2=0
         ORDER BY order_id"""),

    // Q315 (round-17, r16 verdict #2): the BASELINE north-star sentence
    // — "DataFrame read from MongoDB + write to PostgreSQL" — as ONE
    // dataflow across both wire planes. A Mongo-shaped corpus (the
    // q11/q312 fixture semantics re-expressed as real BSON documents)
    // is read over the wire protocol partition-parallel
    // (MongoWireClient.find, 4 _id slices), run through the full
    // T1–T11 transform, and the target plane lands in live Postgres
    // through the DSv2 ledger-arbitrated COPY write
    // (PgDataWriter.commit under Spark's commit coordinator) — the
    // write action's lineage touches both wire clients in one job.
    // Read-back joins the DSv2 scans of both landed planes (target
    // range-partitioned on order_id) and the row-level oracle is
    // q312's, so the library-sink and DSv2 compositions must agree
    // with each other and with the base columns.
    "q315_wire_e2e" -> QuerySpec(
      (s, dir) => {
        import graft.etl._
        import graft.sources.LivePostgres
        val h = LivePostgres.get()
        val conn = PgConn(h.host, h.port, h.user, h.database)
        val sink = new PgWireSink(conn)
        val cm = EtlQueries.ordersMapping.copy(
          targetTable = "public.orders_e2e")
        val audit = EtlDefaults.audit.copy(
          auditTable = "doc_audit.ingestion_audit_e2e")

        sink.execute("DROP TABLE IF EXISTS \"public\".\"orders_e2e\"")
        sink.execute(
          "DROP TABLE IF EXISTS \"doc_audit\".\"ingestion_audit_e2e\"")
        sink.createSchema(audit.auditSchema)
        sink.createTable(cm.targetTable, SchemaManager.buildTableColumns(
          cm, EtlDefaults.runtime.typeMappings,
          audit.businessColumns.toSeq, audit.businessColumnTypes))
        sink.createTable(audit.auditTable,
          SchemaManager.buildAuditTableColumns(audit))
        // re-runnable per JVM: the table was just dropped, so retire
        // this gate's ledger claims too (the q313 convention)
        if (sink.tableExists("graft_meta.copy_ledger"))
          sink.execute(
            "DELETE FROM graft_meta.copy_ledger WHERE batch_id = 'q315-e2e'")

        val srv = MongoFixtures.ordersRaw(s, dir)
        val raw = graft.sources.MongoSource.readRawWirePartitioned(
          s, "127.0.0.1", srv.port, "db", "orders_raw", numPartitions = 4)
        val tc = Transform.transformCollection(raw, "raw", "orders", cm,
          EtlDefaults.runtime, audit,
          clock = to_timestamp(lit("2024-01-01 00:00:00")))
        // one parse+cast pass feeds both plane writes (the Pipeline.run
        // persist contract)
        tc.shared.persist()
        try {
          tc.target.write.format("graft.sources.PgWireSource")
            .option("host", h.host).option("port", h.port)
            .option("user", h.user).option("database", h.database)
            .option("table", cm.targetTable)
            .option("batchId", "q315-e2e")
            .mode("append").save()
          sink.append(tc.audit, audit.auditTable)
        } finally tc.shared.unpersist(blocking = false)
        // ANALYZE the landed tables so the DSv2 read-back below gets
        // pg_class statistics at PLAN time (reltuples is -1 until the
        // first analyze → the scans would size as "huge" and the join
        // could never broadcast at plan time) — the 100 TB-shaped plan,
        // priced at one metadata statement each.
        sink.execute("ANALYZE public.orders_e2e")
        sink.execute("ANALYZE doc_audit.ingestion_audit_e2e")

        def rd(table: String) = s.read.format("graft.sources.PgWireSource")
          .option("host", h.host).option("port", h.port)
          .option("user", h.user).option("database", h.database)
          .option("table", table)
        val t = rd(cm.targetTable)
          .option("partitionColumn", "order_id")
          .option("numPartitions", "4")
          .load()
        val a = rd(audit.auditTable).load()
          .select(col("object_id"), col("missing_columns"))
        t.join(a, a("object_id") === t("order_id").cast("string"))
          .select(
            t("order_id"),
            date_format(t("order_date"), "yyyy-MM-dd").as("order_date"),
            date_format(t("event_ts"), "yyyy-MM-dd'T'HH:mm:ss")
              .as("event_ts"),
            t("amount").cast("double").as("amount"),
            t("amount2").cast("double").as("amount2"),
            t("is_priority"),
            t("priority_label"),
            t("comment"),
            get_json_object(t("raw_json"), "$._id").cast("int").as("raw_id"),
            t("status"),
            size(from_json(col("missing_columns"),
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType)))
              .cast("long").as("n_missing"))
          .orderBy("order_id")
      },
      ConnectorQueries.roundTripOracle)
  )

  /** `schema.table` → `"schema"."table"` for gate-side DROPs. */
  private def lit2(tableName: String): String = {
    val (sch, tbl) = graft.etl.SchemaScript.splitTableName(tableName)
    "\"" + sch.replace("\"", "\"\"") + "\".\"" + tbl.replace("\"", "\"\"") + "\""
  }
}
