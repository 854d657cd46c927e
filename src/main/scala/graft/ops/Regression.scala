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
    val stats = df
      .select(groupCols.map(col) :+ q(col(xCol)).as("xq") :+ q(col(yCol)).as("yq"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("xq")).as("sx"),
        sum(col("yq")).as("sy"),
        sum(col("xq") * col("xq")).as("sxx"),
        sum(col("xq") * col("yq")).as("sxy"),
        sum(col("yq") * col("yq")).as("syy"))
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
}
