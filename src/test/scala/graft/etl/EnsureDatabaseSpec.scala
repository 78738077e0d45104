package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** K3 ensure-database (reference `postgres_loader.ensure_database`,
  * postgres_loader.py:110-168), asserted against a statement-capture
  * double of the admin-connection surface.
  */
class EnsureDatabaseSpec extends AnyFunSuite {

  private def cfg(createIfMissing: Boolean = true) = DatabaseConfig(
    host = "localhost", port = 5432, name = "etl_db", user = "u", password = "p",
    createIfMissing = createIfMissing, adminDb = "postgres")

  /** Capture double: scripted tryConnect, records the admin-DB calls. */
  private class Recorder(
      connect: Either[String, Unit],
      exists: Boolean) extends EnsureDatabase.AdminOps {
    var calls: List[String] = Nil
    override def tryConnect(dbName: String): Either[String, Unit] = {
      calls :+= s"tryConnect($dbName)"; connect
    }
    override def databaseExists(dbName: String): Boolean = {
      calls :+= s"databaseExists($dbName)"; exists
    }
    override def createDatabase(dbName: String): Unit =
      calls :+= s"createDatabase($dbName)"
  }

  test("create_if_missing=false: returns without probing anything") {
    val ops = new Recorder(Left("database \"etl_db\" does not exist"), exists = false)
    EnsureDatabase(cfg(createIfMissing = false), ops)
    assert(ops.calls == Nil)
  }

  test("target database reachable: no admin-DB activity") {
    val ops = new Recorder(Right(()), exists = false)
    EnsureDatabase(cfg(), ops)
    assert(ops.calls == List("tryConnect(etl_db)"))
  }

  test("missing database: admin-DB existence check then CREATE DATABASE") {
    val ops = new Recorder(Left("FATAL: database \"etl_db\" does not exist"), exists = false)
    EnsureDatabase(cfg(), ops)
    assert(ops.calls == List(
      "tryConnect(etl_db)", "databaseExists(etl_db)", "createDatabase(etl_db)"))
  }

  test("race-benign: another creator won — existence check true, no CREATE") {
    val ops = new Recorder(Left("database \"etl_db\" does not exist"), exists = true)
    EnsureDatabase(cfg(), ops)
    assert(ops.calls == List("tryConnect(etl_db)", "databaseExists(etl_db)"))
  }

  test("unrelated connect failure surfaces as LoadError, no CREATE attempted") {
    val ops = new Recorder(Left("FATAL: password authentication failed"), exists = false)
    val e = intercept[LoadError](EnsureDatabase(cfg(), ops))
    assert(e.getMessage.contains("Failed to connect to PostgreSQL"))
    assert(ops.calls == List("tryConnect(etl_db)"))
  }

  test("admin-side failure wraps as LoadError naming the database") {
    val ops = new Recorder(Left("does not exist"), exists = false) {
      override def createDatabase(dbName: String): Unit =
        throw new RuntimeException("permission denied to create database")
    }
    val e = intercept[LoadError](EnsureDatabase(cfg(), ops))
    assert(e.getMessage.contains("Failed to create database 'etl_db'"))
  }

  test("CREATE DATABASE text quotes the identifier") {
    assert(EnsureDatabase.createDatabaseSql("etl_db") == "CREATE DATABASE \"etl_db\"")
    assertThrows[LoadError](EnsureDatabase.createDatabaseSql(""))
  }
}
