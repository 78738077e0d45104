package graft.queries

import java.nio.file.Files

import scala.sys.process._
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cross-engine property for the BPE fit → encode → pack chain
  * (q223/q230/q235): materialize random small corpora and run the
  * ACTUAL gate queries against the ACTUAL oracle SQL in a local DuckDB
  * (via python3, the same engine the driver's comparator uses) — a
  * local replica of the driver's correctness gate over many corpora
  * instead of one fixture, so the q235 class of bug (an oracle idiom
  * that drifts across DuckDB builds, e.g. the round-10 uncast HUGEINT
  * `bin` column) reds out locally instead of surviving until the
  * driver run.
  *
  * Cancels (does not fail) when python3+duckdb is unavailable, so
  * `sbt test` stays green in a container without the driver-side
  * python stack.
  */
class BpeOracleCrossEngineSpec extends AnyFunSuite with SparkTestSession {

  private lazy val duckdbAvailable: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Throwable => false }

  /** Run `sql` in DuckDB with `documents` viewing the staged parquet;
    * rows come back tab-joined with None → "NULL".
    */
  private def duckdb(docsGlob: String, sql: String): Seq[String] = {
    val sqlFile = Files.createTempFile("graft-oracle", ".sql")
    Files.writeString(sqlFile, sql)
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('$docsGlob')")
         |for r in con.execute(open('$sqlFile').read()).fetchall():
         |    print('\\t'.join('NULL' if v is None else str(v) for v in r))
         |""".stripMargin
    val out = new StringBuilder
    val err = new StringBuilder
    val code = (Seq("python3", "-c", script) ! ProcessLogger(
      l => { out.append(l).append('\n'); () },
      l => { err.append(l).append('\n'); () }))
    assert(code == 0, s"duckdb oracle run failed:\n$out\nstderr:\n$err")
    out.toString.split("\n").toSeq.filter(_.nonEmpty)
  }

  private def sparkRows(name: String, dir: String): Seq[String] = {
    val df = TokenizerQueries.specs(name).fn(spark, dir)
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else String.valueOf(r.get(i))).mkString("\t"))
  }

  /** Random corpus: words over a 3-letter alphabet (1–6 chars, far
    * below the oracle's 63-symbol pair-position bound), docs of 0–24
    * words including all-space docs, duplicated docs, and a hot word —
    * the shapes that stress greedy merge ties, empty-after-filter
    * rows, and bin-boundary arithmetic.
    */
  private def writeCorpus(rnd: Random, dir: String): String = {
    import spark.implicits._
    val vocab = Vector.fill(12)((1 to (1 + rnd.nextInt(6)))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val langs = Vector("en", "de", "fr", "zz")
    val nDocs = 20 + rnd.nextInt(20)
    val docs = (0L until nDocs.toLong).map { i =>
      val text =
        if (rnd.nextInt(10) == 0) "   " // empty after token filter
        else (0 until rnd.nextInt(25))
          .map(_ => if (rnd.nextInt(3) == 0) vocab.head else vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      (i, text, langs(rnd.nextInt(langs.size)), "gen", text.length.toLong)
    }
    // duplicate a doc's text under a fresh id (dup-heavy corpora)
    val withDup = docs ++ Seq((nDocs.toLong, docs.head._2, "en", "gen",
      docs.head._2.length.toLong))
    withDup.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    s"$dir/documents.parquet/*.parquet"
  }

  test("q223/q230/q235 match their DuckDB oracles on random corpora") {
    assume(duckdbAvailable, "python3+duckdb not available in this container")
    val rnd = new Random(1123581321L)
    val dir = Files.createTempDirectory("graft-bpe-xengine").toString
    for (trial <- 1 to 5) {
      val glob = writeCorpus(rnd, dir)
      for (q <- Seq("q223_bpe_train", "q230_bpe_encode", "q235_bpe_shard_packing")) {
        val oracle = TokenizerQueries.specs(q).oracle.get
        val got = sparkRows(q, dir).sorted
        val want = duckdb(glob, oracle).sorted
        assert(got == want,
          s"trial $trial $q diverged:\n spark=${got.take(5)}\n duck =${want.take(5)}")
      }
    }
  }
}
