package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: the token streams of all documents in
  * a bucket are conceptually concatenated in deterministic
  * (bucket, id) order and split at fixed `seqLen` boundaries —
  * documents crossing a boundary are split across training sequences,
  * so every sequence except a bucket's last is EXACTLY full (no
  * padding waste), the packing the standard LLM pretraining loader
  * performs.
  *
  * Output is the span map: one row per (document, sequence) pair with
  * the document-local token offset — what a loader needs to assemble
  * sequence tensors, without materializing the token stream itself.
  *
  * Scale shape: documents hash into `buckets` independent packing
  * domains, so the only shuffle is the per-bucket window cumsum (one
  * exchange); span arithmetic is per-row and the boundary explode
  * emits ~n/seqLen rows per doc. No global sequential scan: at 100 TB
  * each bucket packs in parallel, and determinism comes from the
  * (bucket, id) total order, not from execution order.
  */
object Packing {

  /** @return (bucket, seq_id BIGINT — global within bucket, doc_id,
    *         doc_offset BIGINT — first packed token's index within
    *         the doc, n_tokens BIGINT — tokens of this doc in this
    *         sequence). Zero-token docs pack nowhere and emit no row.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int = 512,
      buckets: Int = 16): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(buckets > 0, "buckets must be positive")
    val l = seqLen.toLong
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), TextOps.wordCount(col(textCol)).as("n"))
      .withColumn("bucket", pmod(col(idCol), lit(buckets.toLong)))
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .filter(col("n") > 0L)
      .withColumn("k0", (col("cum") / lit(l)).cast("long"))
      .withColumn("k1", ((col("cum") + col("n") - 1L) / lit(l)).cast("long"))
      .select(col("bucket"), col(idCol), col("n"), col("cum"),
        explode(sequence(col("k0"), col("k1"))).as("seq_id"))
      .select(
        col("bucket"),
        col("seq_id"),
        col(idCol),
        (greatest(col("cum"), col("seq_id") * l) - col("cum")).as("doc_offset"),
        (least(col("cum") + col("n"), (col("seq_id") + 1L) * l) -
          greatest(col("cum"), col("seq_id") * l)).as("n_tokens"))
  }
}
