package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed random projection (Achlioptas/JL sketching) — the
  * dimensionality cut that makes brute-force and IVF scans cheaper at
  * 100 TB: project d-dimensional embeddings onto k pseudo-random ±1
  * directions and search in the k-dim space, paying a bounded
  * distortion (JL lemma) for a d/k reduction in memory bandwidth.
  * The same ±1 hyperplane family as the LSH bucketer
  * ([[TextHash.hyperplanes]]) — LSH keeps only the SIGN of each
  * projection; this keeps the value, so ranking survives.
  *
  * Determinism: the sign matrix is derived from md5 parity (identical
  * in any engine), inputs are milli-quantized integers
  * ([[Similarity.quantize]]), and each projected component is an
  * exact integer dot product — projected vectors are bit-identical
  * everywhere, so downstream ranking gates compare exactly.
  *
  * Scale shape: map-only — one projection per row, k·d multiply-adds
  * inside codegen'd array expressions, no shuffle. The matrix is a
  * plan literal (k·d ints), not a join relation.
  */
object RandomProjection {

  /** Adds `proj` — the k-dim integer projection of `vecCol` — keyed by
    * `idCol`. `dim` must match the embedding length.
    */
  def project(
      emb: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int): DataFrame = {
    val planes = TextHash.hyperplanes(outDim, dim)
    val q = Similarity.quantize(col(vecCol))
    val comps = planes.map { plane =>
      val planeLit = array(plane.map(s => lit(s.toLong)): _*)
      aggregate(zip_with(q, planeLit, (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    }
    emb.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** Integer squared norm of a projected vector. */
  def normSq(proj: Column): Column =
    aggregate(transform(proj, x => x * x), lit(0L), (acc, x) => acc + x)
}
