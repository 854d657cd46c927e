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
}
