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

  test("catalog namespaces: create and list") {
    sqlc("CREATE NAMESPACE IF NOT EXISTS graft_cat.aux")
    val ns = sqlc("SHOW NAMESPACES IN graft_cat").collect().map(_.getString(0))
    assert(ns.contains("aux") && ns.contains("ns"))
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
