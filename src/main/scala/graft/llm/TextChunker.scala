package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap — the sequence-preparation
  * step of a training-data pipeline (long documents become overlapping
  * windows that fit a model's context length).
  *
  * Entirely map-side + one generate: tokens come from a single split,
  * chunk starts from a `sequence` explode, and each chunk is a `slice`
  * of the token array — no shuffle anywhere, so the operator scales
  * linearly with corpus bytes and parallelizes per input split. (The
  * non-scalable formulation would be a self-join of token positions or
  * a collect-and-loop on the driver.)
  *
  * Chunk layout: chunk i covers tokens [i*stride, i*stride + chunkSize);
  * a document of n tokens yields 1 chunk when n <= chunkSize, else
  * 1 + ceil((n - chunkSize) / stride) chunks, so the final chunk always
  * reaches the last token and every token appears in at least one chunk.
  */
object TextChunker {

  /** @param tokenSep token separator to split on (the caller normalizes
    *        whitespace first — see TextAnalysis.normalize)
    */
  def chunkTokens(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      chunkSize: Int = 64,
      stride: Int = 56,
      tokenSep: String = " "): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val base = df.select(idCol.as("doc_id"), split(textCol, tokenSep).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("bigint"))
      .withColumn("n_chunks",
        when(col("n_toks") <= chunkSize, lit(1L))
          .otherwise(ceil((col("n_toks") - chunkSize).cast("double") / stride)
            .cast("bigint") + lit(1L)))
    // Generator in its own select: generator extraction strips aliases
    // inside sibling lambda projections (see SCALING.md traps).
    val exploded = base.select(col("doc_id"), col("toks"),
      explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
    exploded
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("bigint").as("n_tokens"),
        array_join(col("chunk"), tokenSep).as("chunk_text"))
  }
}
