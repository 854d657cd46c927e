package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level quality filters for training-data curation.
  *
  * [[lengthPercentileBand]] keeps documents whose token count lies in
  * the [pLow, pHigh] percentile band — the standard trim of
  * fragment/boilerplate tails. Percentile boundaries are computed
  * EXACTLY but never via a global sort of documents: token counts
  * collapse to their distinct values first (a few thousand at most,
  * regardless of corpus size), the cumulative distribution is a
  * window over that tiny frame, and the two boundary VALUES broadcast
  * back as a 1-row cross join. Boundary definition is integer-only
  * (smallest length whose cumulative count reaches ceil(p·n)), so the
  * kept set is bit-stable across engines and partitionings.
  */
object CorpusFilters {

  /** Documents with dl in the exact [pLowNum/pDen, pHighNum/pDen]
    * percentile band of token counts. Returns (idCol, dl).
    */
  def lengthPercentileBand(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pLowNum: Int = 5,
      pHighNum: Int = 95,
      pDen: Int = 100): DataFrame = {
    val lens = docs.select(
      col(idCol), size(TextOps.words(col(textCol))).cast("long").as("dl"))
    // distribution over DISTINCT lengths — the only windowed frame,
    // and it is small by construction (a constant partition key can't
    // express that: EliminateWindowPartitions folds it away, so the
    // planner's single-partition WARN is instead silenced for the
    // WindowExec logger in GraftSession, where the boundedness
    // contract is documented)
    val dist = lens.groupBy("dl").agg(count(lit(1)).as("cnt"))
    val cum = dist.withColumn("cum",
      sum(col("cnt")).over(
        Window.orderBy(col("dl")).rowsBetween(Window.unboundedPreceding, 0)))
    val total = lens.agg(count(lit(1)).as("n"))
    // boundary = smallest dl with cum >= ceil(p*n/den), in exact
    // integer arithmetic: ceil(a/b) = (a + b - 1) div b
    val bounds = cum.crossJoin(broadcast(total))
      .agg(
        min(when(col("cum") * pDen >= col("n") * pLowNum, col("dl"))).as("lo"),
        min(when(col("cum") * pDen >= col("n") * pHighNum, col("dl"))).as("hi"))
    lens.crossJoin(broadcast(bounds))
      .filter(col("dl") >= col("lo") && col("dl") <= col("hi"))
      .select(col(idCol), col("dl"))
  }

  /** DSIR-flavored importance score for data selection: per document
    * the sum over its tokens of an integer log-likelihood ratio
    * between the TARGET distribution (rows where `isTarget`) and the
    * RAW corpus — "how much does this document look like the data we
    * want more of". The ratio uses the EXACT integer order-of-
    * magnitude log, `ilog2(c+1) = length(bin(c+1)) − 1` (bit length —
    * deterministic in any engine, no float log anywhere), which is
    * the importance-resampling shape with the log coarsened to whole
    * bits; the smoothing `+1` gives unseen-in-target words their
    * natural negative score.
    *
    * Scale shape: the corpus tokenizes ONCE (the word frame feeds
    * both count aggregations and the final join); the ratio table is
    * vocabulary-sized — broadcast when small, an ordinary word-keyed
    * shuffle join beyond that; the per-doc score is one
    * partial-combining sum. Nothing quadratic, nothing driver-side.
    *
    * @return (idCol, n_tokens, score_fp, score_per_kt) — score_fp in
    *         whole bits × token multiplicity (the raw importance
    *         weight), score_per_kt the length-normalized fixed-point
    *         bits-per-1000-tokens (rank/threshold on this one: the
    *         raw sum scales with length, so on a corpus whose word
    *         distributions barely differ by source — like the
    *         synthetic test corpus, where the measured target/raw
    *         separation is ≈0 — the raw score mostly measures length;
    *         the same honest-bill discipline as the ANN recall
    *         numbers).
    */
  def dsirScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame = {
    val words = docs
      .select(col(idCol), isTarget.as("tgt"),
        explode(TextOps.words(col(textCol))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cr = words.groupBy(col("w")).agg(count(lit(1)).as("cr"))
    val ct = words.filter(col("tgt"))
      .groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val ratio = cr.join(ct, Seq("w"), "left")
      .select(col("w"),
        (length(bin(coalesce(col("ct"), lit(0L)) + 1L)) -
          length(bin(col("cr") + 1L))).cast("long").as("r"))
    words
      .join(ratio, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("score_fp"))
      // floor-of-double, not integer div: Spark's `div` truncates
      // toward zero while DuckDB's `//` floors — they disagree on the
      // negative scores this metric mostly produces. floor() floors
      // in both, and the double quotient is exact at these magnitudes
      // (numerator < 2^53, non-integer quotients ≥ 1/n_tokens from
      // any integer).
      .withColumn("score_per_kt",
        floor(lit(1000.0) * col("score_fp") / col("n_tokens")).cast("long"))
  }
}
