package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Spark 4 VARIANT surface — the semi-structured storage model a
  * 100 TB Mongo-style ingest actually wants: instead of re-parsing
  * raw JSON text per access (the reference keeps `raw_json` as a
  * Postgres JSONB column and every query pays a parse,
  * `etl_pipeline/transformer.py:43` attaches the verbatim string),
  * documents parse ONCE into Spark's binary variant encoding and
  * every path access is a typed O(path) lookup — shreddable,
  * pushdown-friendly, and type-preserving under schema drift.
  *
  * Two gates:
  *  - q297 pins the LOSSLESS round trip: row → JSON envelope →
  *    parse_json → typed variant_get extraction → rollup, with the
  *    oracle computing the SAME rollup from the raw columns — no JSON
  *    functions in the oracle at all, so equality proves the variant
  *    encode/decode path byte-faithful (keys, strings, doubles,
  *    nested objects, dropped-null fields).
  *  - q298 pins SCHEMA DRIFT semantics — the Mongo reality the
  *    reference's type-vote inference (I2) exists for: one field
  *    whose type varies by document (int / string / nested object /
  *    explicit null / absent), classified per row via
  *    schema_of_variant + is_variant_null. The oracle reproduces the
  *    classification from the generating rule, so the gate verifies
  *    variant typing reports exactly the shape each document was
  *    built with (JSON null ≠ absent — T2's missing-vs-null
  *    distinction, carried into the variant plane).
  */
object VariantQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q297: variant shredding round trip over orders. Scale shape:
    // parse_json is a per-row map (one pass, codegen'd); the rollup
    // is one hash aggregate on the extracted status — the point is
    // that typed extraction replaces N× get_json_object string
    // re-parses with one binary decode, which is the 100 TB reason
    // VARIANT exists.
    "q297_variant_shred" -> QuerySpec(
      (s, dir) => {
        val env = Tables.orders(s, dir).select(
          to_json(struct(
            col("o_orderkey").as("k"),
            col("o_orderstatus").as("st"),
            col("o_totalprice").as("p"),
            struct(col("o_orderdate").cast("string").as("d"),
              col("o_orderpriority").as("pr")).as("meta"),
            // null fields are DROPPED by to_json (ignoreNullFields):
            // the extracted value must come back as SQL NULL and the
            // count below must see only non-F rows
            when(col("o_orderstatus") =!= "F", col("o_custkey"))
              .as("cust"))).as("js"))
        env.select(expr("parse_json(js)").as("v"))
          .select(
            expr("variant_get(v, '$.st', 'string')").as("status"),
            expr("variant_get(v, '$.k', 'long')").as("k"),
            expr("CAST(round(variant_get(v, '$.p', 'double') * 100) AS BIGINT)")
              .as("cents"),
            expr("variant_get(v, '$.meta.d', 'string')").as("d"),
            expr("variant_get(v, '$.cust', 'long')").as("cust"))
          .groupBy("status")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").cast("long").as("cents"),
            min("d").as("first_day"),
            max("k").cast("long").as("max_key"),
            count(col("cust")).cast("long").as("n_cust"))
          .orderBy("status")
      },
      """SELECT o_orderstatus AS status,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents,
                CAST(min(o_orderdate) AS VARCHAR) AS first_day,
                CAST(max(o_orderkey) AS BIGINT) AS max_key,
                CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_cust
         FROM orders GROUP BY 1 ORDER BY status"""),

    // Q298: schema-drift classification. Each customer doc carries an
    // `x` field whose TYPE rotates with pmod(c_custkey, 5): integer
    // cents, string segment, nested object, explicit JSON null,
    // absent. schema_of_variant names the per-document type and
    // is_variant_null separates JSON null from missing (variant_get
    // on an absent path is SQL NULL, is_variant_null false — the T2
    // distinction). The oracle replays the generating rule, so every
    // document's reported shape must equal the shape it was built
    // with. One map pass + one small rollup.
    "q298_variant_schema_drift" -> QuerySpec(
      (s, dir) => {
        val js = Tables.customer(s, dir).select(
          col("c_custkey").cast("long").as("id"),
          expr("""CASE CAST(pmod(c_custkey, 5) AS INT)
              WHEN 0 THEN concat('{"id": ', c_custkey, ', "x": ',
                                 CAST(round(c_acctbal * 100) AS BIGINT), '}')
              WHEN 1 THEN concat('{"id": ', c_custkey, ', "x": "',
                                 c_mktsegment, '"}')
              WHEN 2 THEN concat('{"id": ', c_custkey, ', "x": {"seg": "',
                                 c_mktsegment, '"}}')
              WHEN 3 THEN concat('{"id": ', c_custkey, ', "x": null}')
              ELSE concat('{"id": ', c_custkey, '}') END""").as("js"))
        // the `$.x` sub-variant is STAGED once (round-14 plan audit: the
        // inline CASE walked the variant path three times per row);
        // schema_of_variant stays — rendering the shape string is this
        // gate's point, one render per row on the staged attribute
        js.select(col("id"), expr("parse_json(js)").as("v"))
          .select(col("id"),
            expr("variant_get(v, '$.x')").as("__vx"),
            expr("try_variant_get(v, '$.x', 'long')").as("as_long"))
          .select(col("id"),
            expr("""CASE
                WHEN __vx IS NULL THEN 'absent'
                WHEN is_variant_null(__vx) THEN 'json_null'
                ELSE schema_of_variant(__vx) END""")
              .as("shape"),
            col("as_long"))
          .groupBy("shape")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("id").cast("long").as("id_sum"),
            count(col("as_long")).cast("long").as("n_longcast"))
          .orderBy("shape")
      },
      """WITH c AS (SELECT c_custkey AS id, c_custkey % 5 AS cls FROM customer)
         SELECT CASE cls WHEN 0 THEN 'BIGINT'
                         WHEN 1 THEN 'STRING'
                         WHEN 2 THEN 'OBJECT<seg: STRING>'
                         WHEN 3 THEN 'json_null'
                         ELSE 'absent' END AS shape,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(id) AS BIGINT) AS id_sum,
                CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_longcast
         FROM c GROUP BY 1 ORDER BY shape""")
  )
}
