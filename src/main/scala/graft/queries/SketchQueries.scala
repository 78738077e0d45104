package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.TableChecksum

/** Round-9 sketch/integrity surface: order-independent fingerprints and
  * mergeable summary aggregates — the "compare 100 TB by exchanging a
  * few numbers" toolbox.
  */
object SketchQueries {

  val specs: Map[String, QuerySpec] = Map(

    // Q174: order-independent table fingerprint, grouped by return
    // flag — count + bit_xor + exact decimal sum of a 60-bit row
    // digest over a canonical integer/date rendering. Row order, file
    // layout, and partitioning can't change it; any changed row does.
    // The grouped form localizes a replication mismatch to the shard
    // to re-copy. One map-side-combined aggregate; the shuffle carries
    // a triple per (group × partition).
    "q174_table_checksum" -> QuerySpec(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        TableChecksum.fingerprint(
          li,
          cols = Seq(
            col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"),
            round(col("l_quantity")).cast("long").cast("string"),
            round(col("l_extendedprice") * 100).cast("long").cast("string"),
            round(col("l_discount") * 100).cast("long").cast("string"),
            col("l_returnflag"), col("l_linestatus"),
            to_date(col("l_shipdate")).cast("string")),
          groupKeys = Seq(col("l_returnflag")))
          .orderBy("l_returnflag")
      },
      """WITH c AS (SELECT l_returnflag,
                      concat_ws('|',
                        CAST(l_orderkey AS VARCHAR),
                        CAST(l_linenumber AS VARCHAR),
                        CAST(CAST(round(l_quantity) AS BIGINT) AS VARCHAR),
                        CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR),
                        CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR),
                        l_returnflag, l_linestatus,
                        CAST(CAST(l_shipdate AS DATE) AS VARCHAR)) AS s
                    FROM lineitem),
         h AS (SELECT l_returnflag,
                      ('0x' || substr(md5(s), 1, 15))::BIGINT AS d
               FROM c)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(bit_xor(d) AS BIGINT) AS fp_xor,
                CAST(sum(d) AS DECIMAL(38,0)) AS fp_sum
         FROM h GROUP BY 1 ORDER BY 1""")
  )
}
