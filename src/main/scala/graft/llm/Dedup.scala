package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextHash._

/** Document deduplication for training-data pipelines: exact (hash
  * group), MinHash+LSH banding (near-dup at scale), n-gram Jaccard
  * (exact verify), SimHash. Everything is signature-bucketed — candidate
  * generation is an equi-join on band/shingle keys, NEVER an all-pairs
  * cross join, so the plans survive a 100 TB corpus (pairs are bounded
  * by bucket co-membership, and the heavy shuffle key is the band
  * signature).
  */
object Dedup {

  /** Space-split word array with empties dropped. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Distinct word n-gram shingles (documents shorter than n words get
    * their single full-text shingle).
    *
    * The word array is BOUND ONCE as a lambda variable before the
    * per-gram loop. Higher-order array functions re-evaluate any
    * non-lambda subtree referenced in their lambda body once per
    * element — the original form captured `words(text)` (a full
    * split+filter of the document, O(tokens)) inside the per-gram
    * lambda, so shingling a T-token document cost O(T²) splits; it
    * went unnoticed for 13 rounds because the bench's old `.count()`
    * action let Catalyst prune the map-only gates that spend all
    * their time here (the round-13 verdict's #1 item — the honest
    * noop-sink protocol surfaced q29/q40 at 21.8/10.4 s). A lambda
    * variable read is an O(1) bound-value access, so this form is the
    * intended O(T·n). `transform(array(w), ...)` is the let-binding:
    * the singleton wrapper evaluates `w` exactly once per row.
    */
  def shingles(text: Column, n: Int = 3): Column =
    element_at(
      transform(array(words(text)), w => {
        val grams = transform(
          sequence(lit(0), size(w) - n),
          j => concat_ws(" ", (0 until n).map(o => element_at(w, j + lit(o + 1))): _*))
        array_distinct(
          when(size(w) >= n, grams).otherwise(array(concat_ws(" ", w))))
      }),
      1)

  /** Exact dedup: group by content hash, keep the smallest id. Returns
    * (text_hash, kept_doc_id, dup_count) for groups with duplicates.
    * One shuffle on the 128-bit hash; map-side partial aggregation.
    */
  def exactDuplicates(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("text_hash"))
      .agg(min(idCol).as("kept_doc_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** The dedup operation itself: keep the smallest-id row per content
    * hash, drop the rest. One shuffle on the hash key; at 100 TB the
    * Window's per-key state is the duplicate-group size, bounded by
    * construction.
    */
  def dropExactDuplicates(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(md5(textCol)).orderBy(idCol)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Shingle hashes in the MinHash domain. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), s => hashMod(s))

  /** MinHash signature: for permutation i, `min((a_i*h + b_i) mod P)`
    * over the document's shingle hashes.
    */
  def minhashSignature(hashes: Column, coefficients: Seq[(Long, Long)]): Column =
    array(coefficients.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * a + b, lit(Prime))))
    }: _*)

  /** LSH band keys: split the signature into `bands` bands of
    * `rowsPerBand`, each rendered `band_h1_..._hr`. Two documents
    * sharing any band key become a candidate pair.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("_",
        lit(b) +: (1 to rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r)): _*)
    }: _*)

  /** Candidate pairs from banded signatures: explode band keys, equi-join
    * on the key (id1 < id2), distinct. The join key is the band
    * signature — bucket-local work only.
    *
    * `saltFactor > 1` is the hot-band defense (SCALING.md): a degenerate
    * band (e.g. the all-boilerplate signature a template corpus
    * collapses into) puts its whole bucket's pair matrix on ONE reducer.
    * Salting appends a deterministic per-id salt to one side of the
    * self-join and replicates the other side across all `saltFactor`
    * salts — the `SkewedAgg.replicatedJoin` recipe applied to band keys
    * — so the hot bucket's work spreads over `saltFactor` reducers at
    * the cost of replicating the (band, id) relation `saltFactor`×. The
    * result set is IDENTICAL to the unsalted join (every pair still
    * meets on exactly the replica matching the left row's salt).
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      bandsCol: String,
      saltFactor: Int = 1): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val a = docs.select(col(idCol).as("id1"), explode(col(bandsCol)).as("band"))
    val b = docs.select(col(idCol).as("id2"), explode(col(bandsCol)).as("band"))
    val joined =
      if (saltFactor == 1) a.join(b, Seq("band"))
      else {
        val sa = a.withColumn("__salt",
          pmod(TextHash.hash60(concat(lit("band_salt:"), col("id1").cast("string"))),
            lit(saltFactor.toLong)))
        val sb = b.withColumn("__salt",
          explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
        sa.join(sb, Seq("band", "__salt"))
      }
    joined
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs (the verify stage): join
    * the shingle sets back and intersect. `sets` must carry
    * (id, shingle-array).
    */
  def jaccardVerify(
      pairs: DataFrame,
      sets: DataFrame,
      idCol: String,
      setCol: String): DataFrame = {
    val s1 = sets.select(col(idCol).as("id1"), col(setCol).as("__s1"))
    val s2 = sets.select(col(idCol).as("id2"), col(setCol).as("__s2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("__inter", size(array_intersect(col("__s1"), col("__s2"))))
      .select(
        col("id1"), col("id2"),
        (col("__inter").cast("double") /
          (size(col("__s1")) + size(col("__s2")) - col("__inter")))
          .as("jaccard"))
  }

  /** Inverted-index n-gram Jaccard: pairs sharing at least one shingle
    * via a self-join ON the shingle (the classic scale pattern — work is
    * proportional to posting-list sizes, not to the pair matrix).
    */
  def jaccardIndex(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    val sets = df.select(idCol.as("id"), shingles(textCol, n).as("sh"))
    // both sides of the self-join scan this relation — persist it once
    // (at cluster scale: checkpoint the posting list). CacheScope-
    // registered so a scoped runner releases it after the query's
    // actions; long-lived callers outside a scope manage it themselves.
    val posting = graft.CacheScope.persist(
      sets.select(col("id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle")))
    val a = posting.select(col("shingle"), col("id").as("id1"), col("n_sh").as("n1"))
    val b = posting.select(col("shingle"), col("id").as("id2"), col("n_sh").as("n2"))
    a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("inter"), first("n1").as("n1"), first("n2").as("n2"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Asymmetric shingle CONTAINMENT over the same posting-list join —
    * the quote/superset detector Jaccard misses: a short document fully
    * embedded in a long one has high |S₁∩S₂|/|S₁| but low Jaccard
    * (the big union drowns it). Emits ORDERED pairs (id1→id2, both
    * directions of a sharing pair) with the intersection size and
    * containment of id1's shingle set in ppm (exact integer rational).
    * `minInter` gates on the ABSOLUTE intersection first so the pair
    * relation stays bounded by real shingle co-occurrence — same scale
    * shape as [[jaccardIndex]]: work ∝ posting-list sizes, never the
    * pair matrix, and the posting relation is persisted for its two
    * join legs.
    */
  def containmentIndex(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int = 3,
      minInter: Long = 2L): DataFrame = {
    val sets = df.select(idCol.as("id"), shingles(textCol, n).as("sh"))
    val posting = graft.CacheScope.persist(
      sets.select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("shingle")))
    val a = posting.select(col("shingle"), col("id").as("id1"), col("n_sh").as("n1"))
    val b = posting.select(col("shingle"), col("id").as("id2"))
    a.join(b, Seq("shingle"))
      .filter(col("id1") =!= col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("inter"), first("n1").as("n1"))
      .filter(col("inter") >= minInter)
      .select(col("id1"), col("id2"), col("inter"), col("n1"),
        expr("(inter * 1000000) div n1").as("cont_ppm"))
  }

  /** Connected components over an undirected pair list (near-dup
    * CLUSTERING — the step after pair detection that training-data
    * dedup actually needs: keep one document per duplicate cluster, not
    * per pair). Iterative min-label propagation: every node starts
    * labeled with its own id; each round a node takes the minimum of
    * its label and its neighbors' labels; at fixpoint the label is the
    * component's smallest member id.
    *
    * Scale notes: rounds needed = graph diameter, and near-dup graphs
    * are dense small clusters (diameter 2–3 in practice); `maxIter`
    * bounds the worst case. Each round is one equi-join on the edge
    * list + one min-aggregation — both shuffle on node id, map-side
    * combined; labels persist per round (cluster scale: checkpoint
    * every few rounds to truncate lineage). The production refinement
    * for adversarial long-chain graphs is large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce"), same
    * join-per-round shape.
    *
    * Returns (id, cluster_id) for every node on an edge; singleton
    * documents are absent by construction (no edge ⇒ no dup).
    */
  def connectedComponents(
      pairs: DataFrame,
      id1: String,
      id2: String,
      maxIter: Int = 20): DataFrame =
    connectedComponentsWithCount(pairs, id1, id2, maxIter)._1

  /** [[connectedComponents]] plus the label relation's EXACT row count
    * (one row per node on an edge), which the convergence loop already
    * materializes — callers gating a broadcast hint on the label size
    * ([[graft.BroadcastGate]]) get the bound with zero extra jobs.
    */
  def connectedComponentsWithCount(
      pairs: DataFrame,
      id1: String,
      id2: String,
      maxIter: Int = 20): (DataFrame, Long) = {
    val edges = graft.CacheScope.persist(
      pairs.select(col(id1).as("src"), col(id2).as("dst"))
        .unionByName(pairs.select(col(id2).as("src"), col(id1).as("dst"))))
    // Per-round lineage CUT, not just cache: `next` references `labels`
    // twice (union + convergence test), so an uncut logical plan doubles
    // every round and Catalyst re-analysis dominates the loop
    // (measured: 27 s → 3 s at sf0.001). localCheckpoint materializes
    // the round and replaces the plan with its blocks; on a cluster use
    // reliable checkpoint() so rounds survive executor loss.
    //
    // Round-0 seed: min(self, direct neighbors) straight off the edge
    // list — one aggregation buys the first propagation round (labels
    // after round k cover the (k+1)-hop neighborhood).
    //
    // Checkpoints are LAZY + an explicit count (r20): an eager
    // localCheckpoint is itself a count job over the internal RDD, so
    // eager-then-count paid two full job launches per round for one
    // materialization. The lazy mark persists the blocks during the
    // count that the loop needs anyway — the convergence probe and the
    // materialization are ONE job per round (the label row count rides
    // round 0's; "did anything move" rides each round's).
    var labels = edges
      .groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster_id"))
      .localCheckpoint(false)
    val nodeCount = labels.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("cluster_id"))
      val next = labels.unionByName(neighborLabels)
        .groupBy("id").agg(min("cluster_id").as("cluster_id"))
        .join(labels.select(col("id"), col("cluster_id").as("__prev")), "id")
        .localCheckpoint(false)
      val changed = next.filter(col("cluster_id") =!= col("__prev")).count()
      labels = next.drop("__prev")
      converged = changed == 0
      iter += 1
    }
    (labels, nodeCount)
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the production-scale alternative to
    * [[connectedComponents]]'s label propagation. Propagation needs
    * O(diameter) rounds, so an adversarial chain-shaped duplicate
    * cluster (doc A ≈ B ≈ C ≈ … — common when a template drifts one
    * edit per generation) costs rounds linear in the chain length.
    * Star operations contract the graph toward each component's
    * minimum in O(log n) rounds REGARDLESS of diameter:
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(N(u) ∪ {u}) — emits (v, m);
    *  - small-star(u), edges oriented high→low: every neighbor v ≤ u
    *    (and u itself) re-attaches to m = min(N⁻(u) ∪ {u}).
    *
    * Each round is one groupBy(min) + one equi-join on the node id —
    * the SAME shuffle shape per round as label propagation, just
    * fewer rounds. Per-round `localCheckpoint` cuts lineage exactly
    * as in [[connectedComponents]] (reliable `checkpoint()` on a real
    * cluster). At fixpoint the edge set IS the star (node → component
    * min), so labels fall out without a final propagation pass.
    *
    * Returns (id, cluster_id) for every node on an edge — same
    * contract and same result as [[connectedComponents]] (gated
    * result-identical against the q36 oracle; the equivalence is also
    * property-tested on random graphs).
    */
  def connectedComponentsStars(
      pairs: DataFrame,
      id1: String,
      id2: String,
      maxIter: Int = 16): DataFrame = {
    // Canonical directed form: high → low, self-loops out, distinct.
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // large-star: group the SYMMETRIZED neighborhood by u, attach every
    // strictly-larger neighbor to min(N(u) ∪ {u}).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy(col("src").as("u"))
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      sym.join(m, col("src") === col("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // small-star: edges already high→low, so N⁻(u) = the dst side;
    // every low neighbor AND u itself attach to the neighborhood min.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
      val joined = e.join(m, col("src") === col("u"))
      joined.select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(joined.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // Lazy checkpoint + count (r20, same fold as connectedComponents):
    // the count the loop needs materializes the checkpoint in ONE job
    // instead of eager-checkpoint-then-count's two.
    var edges = canon(
      pairs.select(col(id1).as("src"), col(id2).as("dst")))
      .localCheckpoint(false)
    // r19: carry each round's cardinality forward instead of re-counting
    // the PREVIOUS round's checkpoint every round — the convergence test
    // was 3 jobs/round (next.count, edges.count, exceptAll), now 2, with
    // identical semantics (the carried count IS last round's next.count).
    var edgeCount = edges.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = canon(smallStar(largeStar(edges))).localCheckpoint(false)
      val nextCount = next.count()
      // Both sides are DISTINCT sets, so equal-count + empty one-sided
      // difference ⇔ set equality. At cluster scale swap the exceptAll
      // for a (count, xor-of-hash) checksum to avoid the extra join.
      converged = nextCount == edgeCount &&
        next.exceptAll(edges).limit(1).count() == 0
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    // Fixpoint edge set is the star: src = member, dst = component min.
    edges.select(col("src").as("id"), col("dst").as("cluster_id"))
      .unionByName(
        edges.select(col("dst").as("id"), col("dst").as("cluster_id")))
      .distinct()
  }

  /** The end-to-end near-dup DROP: cluster the verified pairs, keep
    * each cluster's smallest id, anti-join the rest out of the corpus.
    * Documents on no edge pass through untouched. The loser set is
    * duplicates-bounded — usually orders of magnitude smaller than the
    * corpus, so the anti-join broadcasts over the scan — but a heavily
    * duplicated corpus makes it corpus-fraction-sized (r19 verdict #3),
    * so the hint is size-gated on the label count the clustering loop
    * already measured: past [[graft.BroadcastGate]]'s ceiling the
    * anti-join falls back to a shuffle join instead of an OOM.
    */
  def dropNearDuplicates(
      corpus: DataFrame,
      idCol: String,
      verifiedPairs: DataFrame,
      id1: String = "id1",
      id2: String = "id2"): DataFrame = {
    val (labels, labelCount) =
      connectedComponentsWithCount(verifiedPairs, id1, id2)
    val losers = labels
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    corpus.join(graft.BroadcastGate.ifUnder(losers, labelCount),
      Seq(idCol), "left_anti")
  }

  /** Canonical selection: like [[dropNearDuplicates]] but the kept
    * member of each near-dup cluster is chosen by a QUALITY score
    * (highest `scoreCol`, ties to the smallest id) instead of the
    * smallest-id rule — the curation semantics production pipelines
    * actually want (keep the longest/cleanest variant, drop the rest).
    *
    * Plan shape mirrors dropNearDuplicates: cluster labels live only on
    * docs that appear in a verified pair (duplicates-bounded), so on a
    * typical corpus labels broadcast-join onto the corpus to pick up
    * scores, the per-cluster arg-max runs on that small labeled
    * relation, and the losers broadcast-anti-join out. Both hints are
    * size-gated on the label count the clustering loop already measured
    * ([[graft.BroadcastGate]]): a heavily duplicated corpus makes the
    * label/loser sets corpus-fraction-sized, and past the ceiling the
    * joins fall back to shuffle joins instead of OOMing the driver.
    *
    * CACHE LIFETIME: the internal loser set is persisted; run inside
    * `graft.CacheScope.scoped { ... }` (as Bench/Verify/Probe do) so it
    * is released when the query's actions finish. Outside a scope the
    * persist degrades to caller-unreleasable (the handle is internal) —
    * library callers holding results long-term should wrap their own
    * scope. Same contract on [[dropNearDuplicates]], whose clustering
    * loop persists its edge relation the same way.
    */
  def keepBestPerCluster(
      corpus: DataFrame,
      idCol: String,
      scoreCol: String,
      verifiedPairs: DataFrame,
      id1: String = "id1",
      id2: String = "id2"): DataFrame = {
    val (labelsRaw, labelCount) =
      connectedComponentsWithCount(verifiedPairs, id1, id2)
    val labels = labelsRaw.select(col("id").as(idCol), col("cluster_id"))
    val scored = corpus.select(col(idCol), col(scoreCol))
      .join(graft.BroadcastGate.ifUnder(labels, labelCount), Seq(idCol))
    val rank = row_number().over(
      Window.partitionBy("cluster_id").orderBy(col(scoreCol).desc, col(idCol).asc))
    // Persist the duplicates-bounded loser set: when `corpus` is a
    // union, Catalyst pushes the left-anti join below the union and
    // re-derives the entire losers build — corpus-scan ⋈ labels ⋈
    // window — once PER LEG (q52's 3-leg corpus planned 12 source
    // scans, r19 plan audit). Cached, the build runs once and each leg
    // reads the same blocks (§2.4).
    val losers = graft.CacheScope.persist(
      scored.withColumn("__rn", rank)
        .filter(col("__rn") > 1)
        .select(col(idCol)))
    corpus.join(graft.BroadcastGate.ifUnder(losers, labelCount),
      Seq(idCol), "left_anti")
  }

  /** SimHash (default 32-bit): per token-occurrence hash, sum ±1 per bit
    * position, set the bit where the sum is positive. One explode + one
    * aggregation with `bits` sum expressions (all map-side combinable).
    */
  def simhash(df: DataFrame, idCol: Column, textCol: Column, bits: Int = 32): DataFrame = {
    val tokens = df.select(idCol.as("id"), explode(words(textCol)).as("w"))
      .withColumn("h", hash32(col("w")))
    val sums = (0 until bits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s$j"))
    val sig = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    tokens.groupBy("id")
      .agg(sums.head, sums.tail: _*)
      .select(col("id"), sig.as("simhash"))
  }
}
