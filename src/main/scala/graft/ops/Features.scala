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

  /** Quantile normalization across sources: every distinct (group,
    * value) maps onto the POOLED distribution's value at the
    * equivalent rank — target rank t = ⌈cum_g·n_pool/n_g⌉, normalized
    * value = the pooled value whose cumulative interval contains t.
    * The batch-effect-removal / cross-source score-alignment step
    * before mixing corpora.
    *
    * Shape: ONE corpus scan builds the per-group distinct CDF (the
    * two-phase scale-safe [[Quantiles.cumDist]]); the pooled CDF
    * derives from THAT frame as a weighted cumDist — no second scan.
    * The pooled lookup is an interval point-join: rank space [1, n]
    * partitions into one interval per distinct pooled value, each
    * exploded over ≈n/32-sized rank bins, so the join is a bin
    * equi-join plus a residual BETWEEN — no as-of sort, no correlated
    * scan; explode fan-out totals ≈32 + |distinct pooled values|
    * rows. At 100 TB the t product (cum·n_pool) moves to DECIMAL.
    *
    * @return one row per distinct (g, v): exact integer `cum_s`,
    *         `n_s`, target rank `t`, and `v_norm`.
    */
  def quantileNormalize(
      df: DataFrame, gCol: Column, valueExpr: Column): DataFrame = {
    // persisted: the per-group CDF feeds the pooled re-aggregation,
    // the 1-row pooled total, AND the target-rank frame
    val srcDist = Quantiles.cumDist(df, gCol, valueExpr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val poolDist = Quantiles.cumDist(srcDist, lit("all"), col("v"), col("cnt"))
      .select(col("v").as("v_norm"), col("cnt").as("pcnt"),
        col("cum").as("cum_p"), col("n").as("n_p"))
    val poolTot = srcDist.agg(sum(col("cnt")).as("n_p"))
    val tgt = srcDist.crossJoin(broadcast(poolTot))
      .withColumn("t", expr("(cum * n_p + n - 1) div n"))
      .withColumn("bin", expr("t div greatest(n_p div 32, 1)"))
    val pool = poolDist
      .withColumn("bins", expr(
        """sequence((cum_p - pcnt + 1) div greatest(n_p div 32, 1),
           cum_p div greatest(n_p div 32, 1))"""))
      .select(col("v_norm"), col("cum_p"), col("pcnt"),
        explode(col("bins")).as("bin"))
    tgt.join(pool, "bin")
      .filter(col("t") >= col("cum_p") - col("pcnt") + 1 &&
        col("t") <= col("cum_p"))
      .select(col("g"), col("v"), col("cum").as("cum_s"),
        col("n").as("n_s"), col("t"), col("v_norm"))
  }
}
