package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Local scale-up generator for the EMPIRICAL SCALING PROBE (round-13
  * verdict item 2): replicate the driver's sf0.1 fixtures K× into a
  * local sf1-equivalent directory so the headline query families can be
  * measured one decade apart (sf0.1 → sf1) and the 100 TB claims rest
  * on a measured scaling exponent, not only on plan shape.
  *
  * Replication is SEMANTICS-AWARE, not byte-copy ×K:
  *  - fixed-size dimensions (`region`, `nation`) stay as-is — TPC-H
  *    keeps them constant across scale factors;
  *  - fact/dim keys get a per-replica stride offset, applied to every
  *    foreign key consistently, so referential integrity (and join
  *    selectivity per key) is preserved while key cardinality grows K×;
  *  - `documents.text` is token-salted per replica (every token gets a
  *    `_r<i>` suffix): cross-replica near-duplicate similarity drops to
  *    ~0, so the dedup/LSH families see "K× more distinct content" —
  *    the honest scale-up shape — instead of K× copies of every doc,
  *    which would inflate cluster sizes K× and the within-bucket pair
  *    count K², a data artifact that would masquerade as superlinear
  *    CODE cost (`n_chars` is recomputed to stay consistent);
  *  - `embeddings.embedding` gets a small deterministic per-replica,
  *    per-dimension perturbation (norm-preserving to ~1e-2) so vectors
  *    are distinct across replicas but the space keeps its geometry;
  *  - `events` timestamps are left unchanged: K× the events in the
  *    same time range is exactly how a busier deployment scales, and
  *    it keeps window/sessionize state sizes growing with volume.
  *
  * Replica 0 is verbatim, so the scaled corpus is a superset of the
  * original. Output goes under the repo (`localdata/` is gitignored);
  * /root/testdata stays untouched per TESTDATA.md.
  *
  * Usage: `runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]`.
  */
object ScaleUp {

  /** Key-space stride between replicas — far above any key the driver
    * generator emits at these scale factors, so replica key ranges
    * never collide.
    */
  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("localdata/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get("graft-scaleup")
    try scaleUp(spark, src, dst, k)
    finally spark.stop()
  }

  def scaleUp(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    require(k >= 1, s"factor must be >= 1: $k")
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")

    // fixed-size dimensions: constant across scale factors
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    /** Union of k replicas of `df`, each transformed by `perReplica(i)`
      * (replica 0 is the identity — verbatim original rows).
      */
    def replicate(df: DataFrame, perReplica: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => if (i == 0) df else perReplica(df, i)).reduce(_ unionByName _)

    def shiftKeys(cols: String*)(df: DataFrame, i: Int): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Stride)))

    write(replicate(read("customer"), shiftKeys("c_custkey")), "customer", k)
    write(replicate(read("supplier"), shiftKeys("s_suppkey")), "supplier", k)
    write(replicate(read("part"), shiftKeys("p_partkey")), "part", k)
    write(replicate(read("orders"), shiftKeys("o_orderkey", "o_custkey")),
      "orders", k)
    write(replicate(read("lineitem"),
      shiftKeys("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 2 * k)
    write(replicate(read("events"), shiftKeys("event_id", "user_id")),
      "events", k)

    // documents: token-salted text per replica (see scaladoc)
    write(replicate(read("documents"), (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * Stride))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            t => concat(t, lit(s"_r$i"))), " "))
        .withColumn("n_chars", length(col("text")))),
      "documents", k)

    // embeddings: deterministic norm-preserving perturbation per replica
    write(replicate(read("embeddings"), (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * Stride))
        .withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            (x + lit(i * 0.0013) * (pmod(j, lit(7)) - lit(3)))
              .cast("float")))),
      "embeddings", 1)
  }
}
