package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature standardization — the tabular-ML prep step
  * (z-score features before a linear probe / quality classifier).
  *
  * Scale shape: one partial-combining aggregation collapses each
  * group to its exact sufficient statistics (count, Σx, Σx² as
  * DECIMAL(38) — immune to the long overflow a 100 TB Σx² would
  * hit), broadcast back, then the scaling itself is a shuffle-free
  * codegen'd projection over the original scan. Two passes over the
  * data, zero corpus shuffles.
  *
  * Determinism: values are cent-quantized longs, sums are exact
  * decimals, and each z-score is ONE fixed-order double expression
  * ((x − Σx/n) / sqrt((Σx² − Σx·Σx/n)/n)) — sqrt and division are
  * IEEE-exact, so results are bit-identical cross-engine.
  */
object Features {

  /** Standardize `valueCols` within each `groupCol` group:
    * emits `keepCols`, the group, and one `<col>_z` DOUBLE per value
    * column (population std; a zero-variance feature yields null
    * rather than a misleading 0 or an engine-dependent NaN).
    */
  def zscore(
      df: DataFrame,
      groupCol: String,
      valueCols: Seq[String],
      keepCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    def cents(c: String): Column =
      (col(c).cast("decimal(18,2)") * 100).cast("long")
    val aggs = valueCols.flatMap { c =>
      Seq(
        sum(cents(c).cast("decimal(38,0)")).as(s"_sx_$c"),
        sum((cents(c) * cents(c)).cast("decimal(38,0)")).as(s"_sxx_$c"))
    }
    val allAggs = count(lit(1)).as("_n") +: aggs
    val stats = df.groupBy(col(groupCol))
      .agg(allAggs.head, allAggs.tail: _*)
    val scaled = df.join(broadcast(stats), Seq(groupCol))
    val nd = col("_n").cast("double")
    val zCols = valueCols.map { c =>
      val sx = col(s"_sx_$c").cast("double")
      val sxx = col(s"_sxx_$c").cast("double")
      val mean = sx / nd
      val varPop = (sxx - sx * sx / nd) / nd
      when(varPop === 0.0, lit(null))
        .otherwise((cents(c).cast("double") - mean) / sqrt(varPop))
        .as(s"${c}_z")
    }
    scaled.select(
      keepCols.map(col) ++ Seq(col(groupCol)) ++ zCols: _*)
  }

  /** Winsorization: clip `valueCol` to its per-group exact
    * [p(loNum/loDen), p(hiNum/hiDen)] band — the outlier-taming step
    * before scale-sensitive models. Thresholds are EXACT rank reads
    * on the shared two-phase cumulative distribution
    * ([[Quantiles.cumDist]] — never a per-group single-task sort),
    * broadcast back; the clip itself is a shuffle-free integer
    * projection. Emits `<valueCol>_clipped_cents` BIGINT — fully
    * integer end to end, no float exposure at all.
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      keepCols: Seq[String],
      loNum: Int = 1, loDen: Int = 20,
      hiNum: Int = 19, hiDen: Int = 20): DataFrame = {
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val bounds = Quantiles.cumDist(df, col(groupCol), cents)
      .groupBy(col("g").as(groupCol))
      .agg(
        min(when(col("cum") * loDen >= col("n") * loNum, col("v"))).as("_lo"),
        min(when(col("cum") * hiDen >= col("n") * hiNum, col("v"))).as("_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .select(keepCols.map(col) ++ Seq(
        col(groupCol),
        greatest(col("_lo"), least(col("_hi"), cents))
          .as(s"${valueCol}_clipped_cents")): _*)
  }

  /** Robust z-score: (x − median) / (MAD · 1.4826) per group — the
    * outlier-immune standardization (mean/std in [[zscore]] is itself
    * dragged by the outliers it is supposed to expose; median/MAD is
    * not). Median and MAD are exact rank reads on two cumulative-
    * distribution passes (values, then absolute deviations), both
    * two-phase and broadcast back; the score is one fixed-order
    * closing double expression. MAD = 0 (over half the group at the
    * median) yields null.
    */
  def robustZ(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      keepCols: Seq[String]): DataFrame = {
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val med = Quantiles.cumDist(df, col(groupCol), cents)
      .groupBy(col("g").as(groupCol))
      .agg(min(when(col("cum") * 2 >= col("n"), col("v"))).as("_med"))
    // persisted: the median-joined corpus feeds the deviation cumdist
    // AND the final scoring join — without the cache each consumer
    // replays the corpus scan + broadcast join
    val withMed = df.join(broadcast(med), Seq(groupCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = Quantiles.cumDist(
      withMed, col(groupCol), abs(cents - col("_med")))
      .groupBy(col("g").as(groupCol))
      .agg(min(when(col("cum") * 2 >= col("n"), col("v"))).as("_mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .select(keepCols.map(col) ++ Seq(
        col(groupCol),
        when(col("_mad") === 0L, lit(null))
          .otherwise((cents.cast("double") - col("_med").cast("double")) /
            (col("_mad").cast("double") * lit(1.4826)))
          .as(s"${valueCol}_robust_z")): _*)
  }
}
