package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastText-style linear text classifier over hashed bag-of-words
  * features — the model shape behind production corpus quality
  * filters (CCNet / GPT-3-style "looks like reference text"
  * scoring): every token hashes into one of `NumBuckets` feature
  * buckets, each bucket carries a learned integer weight, and the
  * document score is the plain sum — so scoring is a shuffle-free
  * per-row array fold in the scan projection, embarrassingly parallel
  * at any corpus size.
  *
  * No model files exist in this environment, so the weight table is a
  * deterministic PSEUDO model: W[i] = ((i·2654435761) mod 2003) − 1001
  * (Knuth multiplicative scatter into [−1001, 1001]). The production
  * seam is the `weightOf` function — swap it for a lookup into a
  * broadcast learned (bucket → weight) array and nothing else
  * changes. Integer weights keep the score bit-stable across
  * partitionings and engines (the oracle replicates it term by term).
  */
object Classifier {

  val NumBuckets = 4096L
  val WeightMul = 2654435761L
  val WeightMod = 2003L
  val WeightShift = 1001L

  /** Feature bucket of a token: portable word hash mod D. */
  def bucketOf(w: Column): Column = pmod(TextOps.wordHash(w), lit(NumBuckets))

  /** Pseudo-weight of a bucket (stand-in for a learned table). */
  def weightOf(b: Column): Column =
    pmod(b * lit(WeightMul), lit(WeightMod)) - lit(WeightShift)

  /** Per-document hashed-BoW linear score and keep decision
    * (score ≥ 0). Tokenizes once in its own projection (the lang-id
    * lesson: a lambda-bound subtree referenced N times is evaluated
    * N times without a projection boundary).
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.words(col(textCol)).as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_tokens"),
        aggregate(col("__ws"), lit(0L),
          (acc, w) => acc + weightOf(bucketOf(w))).as("score_fp"))
      .withColumn("keep", (col("score_fp") >= 0L).cast("long"))
}
