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

  /** Segment mean for the PAVA minimax: exact integer prefix-sum
    * differences, one division — computed identically cross-engine,
    * so min/max comparisons over these doubles agree everywhere.
    * Shared with the q_isotonic oracle.
    */
  val SegMeanExpr: String = "CAST(kp - exp_ AS DOUBLE)/(kn - exn)"

  /** Isotonic regression (PAVA) of a binary rate over ordered bins —
    * the calibration step that forces "higher score ⇒ no lower rate"
    * before using scores as probabilities. Input: one row per bin
    * with exact integer totals (bin, n, pos), n ≥ 1. Uses the minimax
    * closed form fitted(i) = max_{j≤i} min_{k≥i} mean(pos[j..k]) /
    * mean(n[j..k]) over the (tiny, ≤bins²·bins) triple expansion:
    * prefix sums on the bin frame, a broadcast pair cross, an
    * i-explode, two hash aggregations. Post-scan cost is a function
    * of the BIN count only — constant in the corpus size.
    *
    * @return (bin, n, pos, rate_raw, rate_iso), rate_iso
    *         nondecreasing in bin.
    */
  def isotonicRates(bins: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    val c = bins.withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("pos")).over(w))
    val js = c.select(col("bin").as("j"),
      (col("cum_n") - col("n")).as("exn"),
      (col("cum_pos") - col("pos")).as("exp_"))
    val ks = c.select(col("bin").as("k"),
      col("cum_n").as("kn"), col("cum_pos").as("kp"))
    val fit = js.crossJoin(broadcast(ks)).filter(col("j") <= col("k"))
      .withColumn("m", expr(SegMeanExpr))
      .select(col("j"), col("m"),
        explode(sequence(col("j"), col("k"))).as("bin"))
      .groupBy("bin", "j").agg(min(col("m")).as("minm"))
      .groupBy("bin").agg(max(col("minm")).as("rate_iso"))
    bins.join(fit, "bin")
      .select(col("bin"), col("n"), col("pos"),
        expr("CAST(pos AS DOUBLE)/n").as("rate_raw"), col("rate_iso"))
  }
}
