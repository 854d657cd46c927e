package graft.ops

import org.apache.spark.sql.DataFrame
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
}
