package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.GramMatrix

/** Round-9 surface growth: distributed linear algebra, the VARIANT
  * semi-structured type, and sequence segmentation — each oracle-gated
  * over the shared fixture tables.
  */
object AlgebraQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q171: Gram matrix Xᵀ·X over the embedding corpus — the
    // covariance/PCA precursor, computed WITHOUT ever joining or
    // shuffling the matrix: per-row upper-triangle products expand in
    // codegen and map-side combine collapses each partition to ≤ d²
    // cells before the single exchange (shuffle volume independent of
    // row count — the declarative twin of MLlib's Gramian
    // treeAggregate). Integer quantization (×1000, the corpus-wide
    // convention from q24/q58) makes every cell sum exact.
    "q171_gram_matrix" -> QuerySpec(
      (s, dir) =>
        // dim(dim+1)/2 products per ROW over a one-split fixture scan:
        // fan out so the outer-product map stage uses every core
        GramMatrix.upperTriangle(
          graft.etl.Ingestion.fanOutForCpu(Tables.embeddings(s, dir)),
          col("embedding"), scale = 1000),
      """WITH v AS (SELECT list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
                    FROM embeddings),
         ix AS (SELECT e, unnest(generate_series(1, len(e))) AS i FROM v),
         pr AS (SELECT e, i, unnest(generate_series(i, len(e))) AS j FROM ix)
         SELECT CAST(i - 1 AS INTEGER) AS i, CAST(j - 1 AS INTEGER) AS j,
                CAST(sum(e[i] * e[j]) AS BIGINT) AS g
         FROM pr GROUP BY 1, 2 ORDER BY 1, 2"""),

    // Q172: the VARIANT semi-structured type (Spark 4 parse_json /
    // variant_get): a nested JSON document is synthesized per event
    // from base columns, parsed to VARIANT, and probed with typed path
    // extraction — nested object path, array index, a DOUBLE-parse
    // (a JSON string field that itself holds JSON), and a
    // try_variant_get type miss that must yield NULL, not an error.
    // The oracle recomputes the expected values from the same base
    // columns, so the gate checks the parse→extract roundtrip is
    // lossless. VARIANT's 100 TB story is the point: one binary-encoded
    // column replaces schema-per-payload tables, and path extraction
    // stays in codegen instead of per-row string re-parsing.
    "q172_variant_shred" -> QuerySpec(
      (s, dir) => {
        val doc = to_json(struct(
          struct(col("event_type").as("type"),
            (col("event_id") % 2 === 0).as("even")).as("meta"),
          array(col("event_id"), col("user_id")).as("ids"),
          col("props").as("raw")))
        // fixture = one parquet file = one split; the per-row parse +
        // five variant probes are CPU-bound, so fan the scan out
        // (no-op on well-split production inputs — Ingestion.fanOutForCpu)
        graft.etl.Ingestion.fanOutForCpu(Tables.events(s, dir))
          .select(col("event_id"), parse_json(doc).as("v"))
          .select(
            col("event_id"),
            expr("variant_get(v, '$.meta.type', 'string')").as("mtype"),
            expr("variant_get(v, '$.meta.even', 'boolean')").as("meven"),
            expr("variant_get(v, '$.ids[1]', 'bigint')").as("uid"),
            expr("""variant_get(
                      parse_json(variant_get(v, '$.raw', 'string')),
                      '$.k', 'bigint')""").as("kk"),
            expr("try_variant_get(v, '$.meta.type', 'bigint')").as("miss"))
          .orderBy("event_id")
      },
      """SELECT event_id, event_type AS mtype,
                event_id % 2 = 0 AS meven, user_id AS uid,
                CAST(json_extract(props, '$.k') AS BIGINT) AS kk,
                CAST(NULL AS BIGINT) AS miss
         FROM events ORDER BY event_id"""),

    // Q173: gaps-and-islands — per-user runs of consecutive active
    // days via the classic dayNumber − row_number() grouping key (two
    // window passes + one aggregate, all partitioned by user: a single
    // hash exchange on user_id carries every step, no join). The
    // segmentation primitive behind retention streaks, sensor uptime,
    // and contiguous-coverage audits.
    "q173_sequence_islands" -> QuerySpec(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val days = Tables.events(s, dir)
          .select(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("d")
        val runs = days
          .withColumn("grp", col("d") - row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("run_len"))
        runs.groupBy("user_id")
          .agg(
            sum(col("run_len")).as("n_days"),
            count(lit(1)).as("n_islands"),
            max(col("run_len")).as("max_run"))
          .orderBy("user_id")
      },
      """WITH days AS (SELECT DISTINCT user_id,
                         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
                       FROM events),
         r AS (SELECT user_id, d,
                 d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
               FROM days),
         runs AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS run_len
                  FROM r GROUP BY 1, 2)
         SELECT user_id, CAST(sum(run_len) AS BIGINT) AS n_days,
                CAST(count(*) AS BIGINT) AS n_islands,
                CAST(max(run_len) AS BIGINT) AS max_run
         FROM runs GROUP BY 1 ORDER BY 1""")
  )
}
