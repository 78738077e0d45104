package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraftCatalogSpec extends AnyFunSuite with SparkTestSession {

  private def sqlc(q: String) = spark.sql(q)

  test("DDL lifecycle: create, read, alter, rename, drop") {
    sqlc("""CREATE TABLE graft_cat.ns.t1
            (id BIGINT, id_sq BIGINT, bucket BIGINT, label STRING)
            TBLPROPERTIES('start'='0', 'end'='100', 'slices'='2')""")
    assert(sqlc("SELECT count(*) FROM graft_cat.ns.t1").head().getLong(0) === 100L)
    // duplicate create is rejected; IF NOT EXISTS is not
    intercept[Exception] {
      sqlc("""CREATE TABLE graft_cat.ns.t1 (id BIGINT)
              TBLPROPERTIES('start'='0', 'end'='1')""")
    }
    sqlc("""CREATE TABLE IF NOT EXISTS graft_cat.ns.t1 (id BIGINT)
            TBLPROPERTIES('start'='0', 'end'='1')""")
    assert(sqlc("SELECT count(*) FROM graft_cat.ns.t1").head().getLong(0) === 100L)
    // alter extends the interval
    sqlc("ALTER TABLE graft_cat.ns.t1 SET TBLPROPERTIES('end'='250')")
    assert(sqlc("SELECT count(*) FROM graft_cat.ns.t1").head().getLong(0) === 250L)
    // rename, then the old name is gone
    sqlc("ALTER TABLE graft_cat.ns.t1 RENAME TO ns.t2")
    assert(sqlc("SELECT max(id) FROM graft_cat.ns.t2").head().getLong(0) === 249L)
    intercept[Exception] { sqlc("SELECT * FROM graft_cat.ns.t1").collect() }
    sqlc("DROP TABLE graft_cat.ns.t2")
    intercept[Exception] { sqlc("SELECT * FROM graft_cat.ns.t2").collect() }
  }

  test("pushdown flows through catalog-resolved tables") {
    sqlc("""CREATE TABLE IF NOT EXISTS graft_cat.ns.t3
            (id BIGINT, id_sq BIGINT, bucket BIGINT, label STRING)
            TBLPROPERTIES('start'='0', 'end'='1000000', 'slices'='4')""")
    val df = sqlc("SELECT id_sq FROM graft_cat.ns.t3 WHERE id = 777")
    assert(df.head().getLong(0) === 777L * 777L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("[777,778)"),
      s"catalog path lost filter pushdown:\n$plan")
    sqlc("DROP TABLE graft_cat.ns.t3")
  }

  test("create rejects a schema or partitioning the catalog cannot serve") {
    // a declared schema that disagrees with the fixed range schema
    // must fail at CREATE, not silently serve different columns
    val e1 = intercept[Exception] {
      sqlc("""CREATE TABLE graft_cat.ns.t_bad (x INT, y STRING)
              TBLPROPERTIES('start'='0', 'end'='10')""")
    }
    assert(e1.getMessage.contains("fixed schema"), e1.getMessage)
    val e2 = intercept[Exception] {
      sqlc("""CREATE TABLE graft_cat.ns.t_bad
              (id BIGINT, id_sq BIGINT, bucket BIGINT, label STRING)
              PARTITIONED BY (bucket)
              TBLPROPERTIES('start'='0', 'end'='10')""")
    }
    assert(e2.getMessage.contains("unpartitioned"), e2.getMessage)
    intercept[Exception] { sqlc("SELECT * FROM graft_cat.ns.t_bad").collect() }
    // the schema-less form is fine: the catalog fills in its schema
    sqlc("""CREATE TABLE graft_cat.ns.t_free
            TBLPROPERTIES('start'='0', 'end'='7')""")
    assert(sqlc("SELECT count(*) FROM graft_cat.ns.t_free").head().getLong(0) === 7L)
    sqlc("DROP TABLE graft_cat.ns.t_free")
  }

  test("catalog namespaces: create and list") {
    sqlc("CREATE NAMESPACE IF NOT EXISTS graft_cat.aux")
    val ns = sqlc("SHOW NAMESPACES IN graft_cat").collect().map(_.getString(0))
    assert(ns.contains("aux") && ns.contains("ns"))
  }

  test("V2 catalog AGGREGATE function: partial/merge planning, null skip, empty input") {
    import spark.implicits._
    // 16 partitions force real cross-partition merge of XOR states
    Seq[java.lang.Long](1L, 2L, 4L, null, 8L).toDF("v").repartition(16)
      .createOrReplaceTempView("g_cat_agg")
    val df = sqlc("SELECT graft_cat.ns.xor_digest(v) AS d FROM g_cat_agg")
    assert(df.head().getLong(0) === (1L ^ 2L ^ 4L ^ 8L)) // null skipped
    // the plan must be a two-stage aggregate (partial then final) —
    // the merge path, not a single-stage collapse
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"no partial aggregation stage:\n$plan")
    // empty input produces the initial state, not null
    assert(sqlc("SELECT graft_cat.ns.xor_digest(v) FROM g_cat_agg WHERE v > 99")
      .head().getLong(0) === 0L)
    // grouped form through catalog resolution
    val grouped = sqlc("""SELECT graft_cat.ns.residue16(v) AS b,
                                 graft_cat.ns.xor_digest(v) AS d
                          FROM g_cat_agg WHERE v IS NOT NULL
                          GROUP BY 1 ORDER BY b""").collect()
    assert(grouped.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 4L -> 4L, 8L -> 8L))
  }

  test("bound V2 function evaluates and matches its floorMod contract") {
    val r = sqlc("SELECT graft_cat.ns.residue16(33), graft_cat.ns.residue16(-1)")
      .head()
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 15L, "floorMod semantics on negatives")
    // grouped use: matches the bucket column of the range table itself
    sqlc("""CREATE TABLE IF NOT EXISTS graft_cat.ns.t4
            (id BIGINT, id_sq BIGINT, bucket BIGINT, label STRING)
            TBLPROPERTIES('start'='-50', 'end'='50', 'slices'='3')""")
    val bad = sqlc("""SELECT count(*) FROM graft_cat.ns.t4
                      WHERE graft_cat.ns.residue16(id) <> bucket""")
    assert(bad.head().getLong(0) === 0L)
    sqlc("DROP TABLE graft_cat.ns.t4")
  }
}
