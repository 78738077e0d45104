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
  /** EXPLICIT double widening before the multiply: Spark coerces
    * float*int to DOUBLE, DuckDB keeps FLOAT — a float sitting exactly
    * on a .5 boundary after the float multiply (one exists in the
    * sf0.1 corpus: 0.3195f*1000 = 319.5f vs 319.4999... in double)
    * then rounds differently. Both the operator and every oracle pin
    * the DOUBLE path (`CAST(x AS DOUBLE)*1000`) so quantization is
    * engine-identical, not coercion-dependent.
    */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * 1000).cast("long"))

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

  /** Milli-quantized (`__q`, `__n`) plus a per-vector-scaled int8 code
    * (`__q8`) — the storage layout of a two-stage ANN index: coarse
    * scoring reads the 1-byte-per-dim code, the exact stage reads the
    * wide vector only for survivors. The scale is hoisted into its own
    * projection so the array_max is computed once per row, not once per
    * element.
    */
  private def prepared8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol),
      quantize(col(vecCol)).as("__q"),
      transform(col(vecCol), e => e.cast("double")).as("__x"))
      .withColumn("__n", intDot(col("__q"), col("__q")))
      // greatest(…, MIN_VALUE) guards the all-zero vector: scale 0
      // would make the code 0/0 (NaN→0 in Spark, NULL in SQL engines);
      // with the guard a zero vector gets the all-zero code, which is
      // the sensible coarse representation for it.
      .withColumn("__scale",
        greatest(array_max(transform(col("__x"), e => abs(e))) / 127.0,
          lit(java.lang.Double.MIN_VALUE)))
      .select(col(idCol), col("__q"), col("__n"),
        transform(col("__x"),
          e => floor(e / col("__scale") + lit(0.5)).cast("long")).as("__q8"))

  /** Two-stage ANN: int8 coarse scan → exact rerank. Stage 1 scores
    * every candidate against the broadcast query set on the int8 codes
    * (4–8× less memory bandwidth than the exact vectors — the reason
    * production ANN reranks at all) and keeps `coarseK` per query;
    * stage 2 ranks only those survivors by exact integer-quantized
    * cosine. Both stages are WindowGroupLimit-bounded windows over a
    * broadcast NLJ — per-partition state is coarseK rows per query.
    * All-integer scores make both stages engine-exact.
    */
  def rerankTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      coarseK: Int,
      k: Int): DataFrame = {
    require(coarseK >= k, s"coarseK ($coarseK) must be >= k ($k)")
    val q = prepared8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__q").as("__qv"),
        col("__n").as("__qn"), col("__q8").as("__q8q"))
    val c = prepared8(candidates, idCol, vecCol)
      .select(col(idCol).as("candidate_id"), col("__q").as("__cv"),
        col("__n").as("__cn"), col("__q8").as("__q8c"))
    c.crossJoin(broadcast(q))
      .withColumn("coarse", intDot(col("__q8c"), col("__q8q")))
      .withColumn("__crank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("coarse"), col("candidate_id"))))
      .filter(col("__crank") <= coarseK)
      .withColumn("cosine",
        cosine(intDot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), col("candidate_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "candidate_id", "coarse", "rank", "cosine")
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
  /** Map-side nearest-centroid expression over the `__q`/`__n` columns
    * of a [[prepared]] frame: argmax of per-centroid cosine, ties to
    * the LOWEST index (the fold keeps the first maximum; callers order
    * `centRows` so index order is their tiebreak order). The whole
    * centroid table rides as ONE array<struct<idx,vec,norm>> literal —
    * per-centroid `array(lit, lit, …)` columns instead put C×D literal
    * nodes in the tree (at 40×64 that took Catalyst ~20 s to re-analyze
    * per run, BENCH_r04); a single Literal is O(1) tree nodes and the
    * per-row work is the same C×D multiply-adds (native via
    * [[graft.plans.RewriteLongDotChain]]) either way.
    */
  private[llm] def nearestCell(centRows: Seq[(Int, Seq[Long], Long)]): Column = {
    val scored = transform(typedlit(centRows), c =>
      struct(
        cosine(intDot(col("__q"), c("_2")), col("__n"), c("_3")).as("c"),
        c("_1").as("i")))
    // Sentinel zero (cosine ∈ [-1,1] > -2 always) rather than
    // element_at(scored, 1), which would evaluate the whole transform a
    // second time per row just to read its head.
    aggregate(
      scored,
      struct(lit(-2.0).as("c"), lit(-1).as("i")),
      (acc, x) => when(x("c") > acc("c"), x).otherwise(acc))("i")
  }

  /** In-engine IVF centroid training: `iters` rounds of spherical
    * k-means (cosine assignment, element-wise mean update) with fully
    * deterministic arithmetic — integer component sums, exact-double
    * division, truncation back to the quantized integer grid — so any
    * engine replays it bit-for-bit. Seeds are the `k` smallest-id
    * vectors (deterministic; production would k-means++ over a sample
    * the same way). Returns (cell, d, value, n_members): one row per
    * centroid component, driver-comparator-friendly.
    *
    * Scale shape per round: ONE map-side assignment pass over the
    * corpus (the broadcast-literal argmax above — zero shuffle), then
    * ONE shuffle of (cell, dim) partial sums (posexplode feeds
    * map-side-combined sum/count, so the shuffle carries k×dim rows per
    * partition, not the corpus). The k×dim result collects to the
    * driver to seed the next round's literal — the classic Lloyd's
    * loop. Cells that lose all members keep their previous centroid.
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val prep = graft.CacheScope.persist(prepared(corpus, idCol, vecCol))
    def withNorm(vec: Seq[Long]): (Seq[Long], Long) =
      (vec, vec.map(x => x * x).sum)
    var cents: Seq[(Seq[Long], Long)] =
      prep.orderBy(col(idCol)).limit(k).collect().toSeq
        .map(r => withNorm(r.getSeq[Long](1)))
    var members = Map.empty[Int, Long]
    for (_ <- 1 to iters) {
      val centRows = cents.zipWithIndex.map { case ((v, n), i) => (i, v, n) }
      // Two selects: a generator (posexplode) sharing a projection with
      // the argmax fold trips the analyzer's generator extraction,
      // which strips the aliases inside the fold's lambda structs.
      val sums = prep
        .select(col("__q"), nearestCell(centRows).as("__cell"))
        .select(col("__cell"), posexplode(col("__q")).as(Seq("d", "v")))
        .groupBy("__cell", "d")
        .agg(sum("v").as("s"), count(lit(1)).as("cnt"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      members = byCell.map { case (cell, rows) => cell -> rows.head.getLong(3) }
      cents = cents.zipWithIndex.map { case (old, cell) =>
        byCell.get(cell) match {
          case None => old // empty cell keeps its centroid
          case Some(rows) =>
            // trunc(sum/count) in exact doubles: |sum| < 2^53 by
            // construction (milli-quantized components), so the double
            // division is exact-input and truncation matches any
            // engine's trunc().
            withNorm(rows.sortBy(_.getInt(1)).toSeq
              .map(r => (r.getLong(2).toDouble / r.getLong(3)).toLong))
        }
      }
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.flatMap { case ((vec, _), cell) =>
      vec.zipWithIndex.map { case (v, d) =>
        (cell, d + 1, v, members.getOrElse(cell, 0L))
      }
    }.toDF("cell", "d", "value", "n_members")
  }

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
    // Materialize each side's assignment ONCE (CacheScope-registered):
    // the cell column feeds the join key and the join re-projects the
    // row, and an unpersisted argmax-fold subtree re-evaluates per
    // consumer (measured 6× the whole query's runtime at sf0.1). At
    // cluster scale this is the IVF posting-list build you would
    // checkpoint — assignment is computed once per corpus, never
    // inline in a probe join.
    def assign(df: DataFrame, id: String): DataFrame =
      graft.CacheScope.persist(
        prepared(df, idCol, vecCol)
          .select(col(idCol).as(id), col("__q"), col("__n"),
            nearestCell(centRows).as("__cell")))
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

  /** Multi-probe LSH top-k: each query probes its own bucket PLUS every
    * bucket at Hamming distance 1 (one sign bit flipped) — the standard
    * recall fix for hyperplane LSH (Lv et al. 2007, "Multi-Probe LSH"):
    * a true neighbor lost to ONE near-boundary hyperplane vote is
    * recovered without adding tables or rescanning candidates. The
    * QUERY side explodes ×(P+1) (tiny by contract); the candidate side
    * still carries one bucket per vector, and since probed buckets are
    * distinct a (query, candidate) pair can match at most once — no
    * dedup step. q238/q239 gate the measured recall delta.
    */
  def lshTopKMultiProbe(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Seq[Seq[Int]]): DataFrame = {
    val pBits = planes.size
    val q = prepared(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__q").as("__qv"), col("__n").as("__qn"),
        bucketId(col("__q"), planes).as("__b0"))
      .withColumn("__bucket", explode(array(
        col("__b0") +: (0 until pBits).map(i =>
          col("__b0").bitwiseXOR(lit(1L << i))): _*)))
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
