package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed closed-form linear regression — the classic scalable
  * ML fit: per group, simple OLS of y on x needs only five sufficient
  * statistics (n, Σx, Σy, Σx², Σxy [, Σy² for R²]), each an exact
  * map-side-combinable sum, so the whole fit is ONE aggregation pass
  * over the data and a constant-time closed-form solve. No gradient
  * iterations, no driver-side data, and the plan is the same
  * two-phase hash aggregate as any groupBy sum — at 100 TB a model
  * fit costs exactly one scan.
  *
  * Determinism: inputs are quantized to integer cents
  * (⌊v·100⌋ longs), so every sufficient statistic is an exact
  * order-free integer sum; the final β/R² formulas run in double on
  * those exact sums — a fixed sequence of IEEE operations that
  * replicates bit-for-bit in the DuckDB oracle.
  */
object Regression {

  /** @return one row per group: (groupCols…, n BIGINT, beta0, beta1,
    *         r2 DOUBLE) for y ≈ beta0 + beta1·x (in the original,
    *         un-quantized units). Groups with zero x-variance emit
    *         beta1 = 0, beta0 = mean(y), r2 = 0.
    */
  def olsFit(
      df: DataFrame,
      yCol: String,
      xCol: String,
      groupCols: Seq[String]): DataFrame = {
    def q(c: Column): Column = floor(c.cast("double") * 100.0).cast("long")
    // second-order sums fold in DECIMAL(38,0): Σy² of cents-scale
    // values passes 2^63 in the single-digit-TB range (it was within
    // 2× of wrapping at sf0.1 already) — decimal keeps the fold exact
    // and order-free at any scale, and casts to the identical double
    val d18 = "decimal(18,0)"
    val xd = col("xq").cast(d18)
    val yd = col("yq").cast(d18)
    val stats = df
      .select(groupCols.map(col) :+ q(col(xCol)).as("xq") :+ q(col(yCol)).as("yq"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("xq")).as("sx"),
        sum(col("yq")).as("sy"),
        sum(xd * xd).as("sxx"),
        sum(xd * yd).as("sxy"),
        sum(yd * yd).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double")
    val syy = col("syy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    // quantization cancels in beta1 (cents/cents); beta0 rescales /100
    val beta1 = when(varX === 0.0, lit(0.0)).otherwise(cov / varX)
    val beta0 = (sy - beta1 * sx) / n / lit(100.0)
    val r2 = when(varX === 0.0 || varY === 0.0, lit(0.0))
      .otherwise(cov * cov / (varX * varY))
    stats.select(groupCols.map(col) :+ col("n") :+ beta0.as("beta0") :+
      beta1.as("beta1") :+ r2.as("r2"): _*)
  }

  /** Two-regressor OLS per group: y ≈ b0 + b1·x1 + b2·x2, solved in
    * closed form from the 3×3 normal equations via Cramer's rule on
    * NINE exact sufficient statistics — still ONE partial-combining
    * aggregation pass and a constant-time finish; the multivariate
    * fit costs exactly what the simple fit costs. All second-order
    * sums fold in DECIMAL(38,0) (overflow-safe at any scale), the
    * determinants run in double on the exact sums in a fixed
    * expression order replicated in the oracle. Near-singular systems
    * (|D| = 0 exactly, e.g. collinear regressors) emit zero betas.
    *
    * Coefficients are reported in the original units: cents
    * quantization cancels in b1/b2 (cents/cents) and b0 rescales
    * by /100.
    *
    * @return (groupCols…, n, beta0, beta1, beta2)
    */
  def olsFit2(
      df: DataFrame,
      yCol: String,
      x1Col: String,
      x2Col: String,
      groupCols: Seq[String]): DataFrame = {
    def q(c: Column): Column = floor(c.cast("double") * 100.0).cast("long")
    val d18 = "decimal(18,0)"
    def d(name: String): Column = col(name).cast(d18)
    val stats = df
      .select(groupCols.map(col) :+ q(col(x1Col)).as("a") :+
        q(col(x2Col)).as("b") :+ q(col(yCol)).as("y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("a")).as("sa"),
        sum(col("b")).as("sb"),
        sum(col("y")).as("sy"),
        sum(d("a") * d("a")).as("saa"),
        sum(d("a") * d("b")).as("sab"),
        sum(d("b") * d("b")).as("sbb"),
        sum(d("a") * d("y")).as("say"),
        sum(d("b") * d("y")).as("sby"))
    // Cramer on [[n,sa,sb],[sa,saa,sab],[sb,sab,sbb]] · β = [sy,say,sby]
    // — one shared det3 text keeps Spark and the oracle token-identical
    stats.selectExpr(
      groupCols ++ Seq(
        "n",
        s"CASE WHEN ($Det2) = 0.0 THEN 0.0 ELSE ($Det2B0) / ($Det2) / 100.0 END AS beta0",
        s"CASE WHEN ($Det2) = 0.0 THEN 0.0 ELSE ($Det2B1) / ($Det2) END AS beta1",
        s"CASE WHEN ($Det2) = 0.0 THEN 0.0 ELSE ($Det2B2) / ($Det2) END AS beta2"): _*)
  }

  /** Determinant expression texts shared verbatim by [[olsFit2]] and
    * its DuckDB oracle (`graft.queries.ExtQueries`): identical token
    * sequences guarantee identical IEEE evaluation order. The casts
    * normalize BIGINT/DECIMAL sums to double in both engines.
    */
  private def c(e: String): String = s"CAST($e AS DOUBLE)"
  val Det2: String = det3("CAST(n AS DOUBLE)", c("sa"), c("sb"),
    c("sa"), c("saa"), c("sab"), c("sb"), c("sab"), c("sbb"))
  val Det2B0: String = det3(c("sy"), c("sa"), c("sb"),
    c("say"), c("saa"), c("sab"), c("sby"), c("sab"), c("sbb"))
  val Det2B1: String = det3("CAST(n AS DOUBLE)", c("sy"), c("sb"),
    c("sa"), c("say"), c("sab"), c("sb"), c("sby"), c("sbb"))
  val Det2B2: String = det3("CAST(n AS DOUBLE)", c("sa"), c("sy"),
    c("sa"), c("saa"), c("say"), c("sb"), c("sab"), c("sby"))

  private def det3(
      a: String, b: String, cc: String,
      dd: String, e: String, f: String,
      g: String, h: String, i: String): String =
    s"$a*($e*$i - $f*$h) - $b*($dd*$i - $f*$g) + $cc*($dd*$h - $e*$g)"

  /** Theil-Sen robust trend slope per group: the MEDIAN of all
    * pairwise slopes (y₂−y₁)/(x₂−x₁) — a single wild outlier that
    * drags the OLS line barely moves it (29.3% breakdown point).
    * The complement to [[olsFit]] on dirty operational series.
    *
    * MUST run on a pre-aggregated series frame (one row per (group,
    * x) — e.g. daily rollups): pair generation is a within-group
    * self-join, O(T²) pairs for a T-point series, which is constant
    * work when T is calendar-bounded and would be quadratic in the
    * corpus if fed raw rows. The median is an exact rank read over
    * the per-group collected slope array (bounded by T²); slope
    * doubles are single divisions of exact integers, so ordering and
    * the midpoint average agree bit-for-bit cross-engine.
    *
    * @return (g, n_pairs, ts_slope)
    */
  def theilSen(
      df: DataFrame,
      groupCol: Column,
      xCol: Column,
      yCol: Column): DataFrame = {
    val a = df.select(groupCol.as("g"), xCol.as("x"), yCol.as("y"))
    val p = a.as("l")
      .join(a.as("r"), col("l.g") === col("r.g") && col("l.x") < col("r.x"))
      .select(col("l.g").as("g"),
        ((col("r.y") - col("l.y")).cast("double") /
          (col("r.x") - col("l.x")).cast("double")).as("sl"))
    p.groupBy("g")
      .agg(sort_array(collect_list(col("sl"))).as("sls"),
        count(lit(1)).as("n_pairs"))
      .select(col("g"), col("n_pairs"), expr(
        """CASE WHEN n_pairs % 2 = 1
           THEN element_at(sls, CAST((n_pairs + 1) div 2 AS INT))
           ELSE (element_at(sls, CAST(n_pairs div 2 AS INT))
             + element_at(sls, CAST(n_pairs div 2 + 1 AS INT))) / 2
           END""").as("ts_slope"))
  }

  /** Absolute prediction residual in exact cents, shared verbatim
    * with the conformal oracle: the double arithmetic inside is
    * identical token-for-token, and the floor-to-cents makes every
    * downstream rank/compare integer-exact.
    */
  val ResidCentsExpr: String =
    "CAST(floor(abs(y - (beta0 + beta1 * x)) * 100) AS BIGINT)"

  /** Split-conformal prediction interval for the [[olsFit]] line —
    * the distribution-free way to turn ANY point predictor into a
    * calibrated interval (Vovk et al.; Lei et al. 2018): fit on the
    * train fold, take the ⌈(n_cal+1)·α⌉-th smallest absolute
    * residual on a DISJOINT calibration fold as the radius q̂, then
    * report honest MEASURED coverage on a third test fold (the
    * ≥α guarantee is marginal over splits — an expectation, so it is
    * not emitted as a certificate; the measured number is).
    *
    * Scale shape: one olsFit aggregation over train; residual ranks
    * on the calibration fold via the bucketed two-phase
    * [[Quantiles.cumDist]] (never a global sort); exact integer
    * coverage counts on test. The fitted line and q̂ travel as 1-row
    * broadcasts. `alphaNum/alphaDen` give the level as an exact
    * rational (9/10 = 90%) so the rank threshold
    * k = ⌈(n_cal+1)·num/den⌉ is pure integer arithmetic.
    *
    * @param foldExpr integer expression ≥ 0; %3 splits train/cal/test
    * @return one row (n_train, n_cal, n_test, q_hat, n_covered,
    *         coverage)
    */
  def splitConformal(
      df: DataFrame,
      yCol: String,
      xCol: String,
      foldExpr: Column,
      alphaNum: Int = 9,
      alphaDen: Int = 10): DataFrame = {
    val base = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"), (foldExpr % 3).as("fold"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fit = olsFit(base.filter(col("fold") === 0), "y", "x", Seq.empty)
      .select(col("n").as("n_train"), col("beta0"), col("beta1"))
    val calRes = base.filter(col("fold") === 1)
      .crossJoin(broadcast(fit))
      .select(col("n_train"), expr(ResidCentsExpr).as("rq"))
    val qhat = Quantiles.cumDist(calRes, lit(0), col("rq"))
      .agg(first(col("n")).as("n_cal"),
        min(when(col("cum") * alphaDen >=
          (col("n") + 1) * alphaNum, col("v"))).as("q_hat"))
    val out = base.filter(col("fold") === 2)
      .crossJoin(broadcast(fit))
      .crossJoin(broadcast(qhat))
      .select(col("n_train"), col("n_cal"), col("q_hat"),
        (expr(ResidCentsExpr) <= col("q_hat")).cast("long").as("cov"))
      .groupBy("n_train", "n_cal", "q_hat")
      .agg(count(lit(1)).as("n_test"), sum("cov").as("n_covered"))
      .select(col("n_train"), col("n_cal"), col("n_test"), col("q_hat"),
        col("n_covered"),
        expr("CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)")
          .as("coverage"))
    out
  }
}
