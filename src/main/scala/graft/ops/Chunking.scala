package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking — the context-window prep step of an
  * LLM training pipeline: each document becomes overlapping chunks of
  * `width` tokens with stride `stride`, and the LAST chunk is clamped
  * to end exactly at the final token, so every token of every
  * document lands in at least one chunk and every chunk of a document
  * with ≥ `width` tokens is full-width (no ragged tail to pad away
  * downstream).
  *
  * Chunk starts (1-based): 1, 1+stride, …, plus the clamped final
  * start max(n−width, 0)+1. With f = max(n−width, 0) the chunk count
  * is ⌈f/stride⌉+1, which degrades to a single chunk for short docs.
  *
  * Scale shape: tokenize once (the codegen'd whitespace tokenizer),
  * then explode a tiny integer sequence per row — the blowup is
  * ~n/stride rows per doc, data-proportional, with NO shuffle at all:
  * chunking is embarrassingly parallel and the plan is a single
  * narrow Project→Generate chain over the scan.
  */
object Chunking {

  /** @return (id, chunk_id BIGINT 0-based, n_tokens BIGINT,
    *         chunk_text STRING). */
  def tokenWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int = 50,
      stride: Int = 30): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    require(stride <= width, "stride > width would drop tokens between chunks")
    docs
      .select(col(idCol), TextOps.words(col(textCol)).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("f", greatest(col("n") - lit(width.toLong), lit(0L)))
      .withColumn("k",
        ((col("f") + lit(stride - 1L)) / lit(stride.toLong)).cast("long"))
      .select(col(idCol), col("ws"), col("f"), col("k"),
        explode(sequence(lit(0L), col("k"))).as("chunk_id"))
      .withColumn("start",
        when(col("chunk_id") < col("k"), lit(1L) + col("chunk_id") * lit(stride.toLong))
          .otherwise(col("f") + lit(1L)))
      .withColumn("chunk", slice(col("ws"), col("start").cast("int"), lit(width)))
      .select(
        col(idCol),
        col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
