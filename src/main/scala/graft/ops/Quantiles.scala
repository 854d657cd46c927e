package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped order statistics from the distinct-value cumulative
  * distribution — shared machinery behind `q_quantiles_exact` (rank
  * thresholds) and `q_percentile_cont` (interpolated reads).
  *
  * Scale shape (the round-5 audit's one flagged shape, fixed in
  * round 6): the naive cumulative sum `Window.partitionBy(g)
  * .orderBy(v)` sorts each group's WHOLE distinct-value distribution
  * in one task — parallelism equals group count. Here the running
  * sum is two-phase: deterministic equal-width value buckets within
  * each group (broadcast per-group min/max), a local running sum per
  * (group, bucket), and broadcast per-bucket prefix offsets from the
  * tiny (group × bucket) summary frame. Parallelism is group count ×
  * bucket count at any data size. Bucketing is an order-preserving
  * FUNCTION of the value — not repartitionByRange, whose sampled
  * boundaries may disagree between the frame's two uses if the
  * exchange isn't reused — so both phases are consistent by
  * construction and the result is deterministic under any
  * partitioning.
  */
object Quantiles {

  /** Exact cumulative distribution of `valueExpr` (an integer-safe
    * expression, e.g. cent-quantized money) within each group:
    * one row per distinct (g, v) with its weight total, the
    * cumulative weight `cum` (rows ≤ v in g), and the group total
    * `n`. With the default unit weight these are plain counts;
    * passing an integer `weightExpr` turns every downstream reader
    * into its WEIGHTED form (weighted median/percentiles) with the
    * same exact arithmetic and the same two-phase plan.
    *
    * The value at 1-based (weighted) rank k in group g is
    * `min(v) WHERE cum >= k` — all downstream readers (rank
    * thresholds, interpolation endpoints) are conditional-min
    * aggregates over this frame.
    */
  def cumDist(
      df: DataFrame,
      gCol: Column,
      valueExpr: Column,
      weightExpr: Column = lit(1L)): DataFrame = {
    val nB = df.sparkSession.sessionState.conf.numShufflePartitions
    // persisted: the distinct-value frame feeds ranges, the bucketed
    // main pass, AND the offsets summary — without the cache the
    // scan→distinct agg lineage evaluates per consumer (the minhash
    // one-scan discipline; ContextCleaner frees the blocks once the
    // frame is unreferenced). The frame is one row per distinct
    // (group, value): orders of magnitude below the input.
    val dist = df
      .select(gCol.as("g"), valueExpr.as("v"), weightExpr.as("w"))
      .groupBy("g", "v").agg(sum("w").as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranges = dist.groupBy("g")
      .agg(min("v").as("vmin"), max("v").as("vmax"))
    // bucket arithmetic FULLY in double: a LONG (v - vmin) — or a
    // LONG (vmax - vmin + 1) denominator — wraps for value spans
    // ≥ 2^63 (data mixing near-Long.MinValue and near-Long.MaxValue),
    // breaking bucket monotonicity. Casting the operands BEFORE
    // subtracting never wraps; buckets only need to be a weakly
    // monotone function of v (offsets order by bkt, in-bucket windows
    // order by v), and round-to-double of a long, IEEE subtraction,
    // and a positive scale all preserve weak monotonicity.
    val bucketed = dist.join(broadcast(ranges), Seq("g"))
      .withColumn("bkt",
        ((col("v").cast("double") - col("vmin").cast("double")) * nB /
          (col("vmax").cast("double") - col("vmin").cast("double") + 1.0d))
          .cast("long"))
    // tiny frame: one row per (group, bucket) — prefix offsets and
    // group totals computed here, broadcast back
    val offsets = bucketed.groupBy("g", "bkt").agg(sum("cnt").as("pcnt"))
      .withColumn("off", coalesce(
        sum(col("pcnt")).over(Window.partitionBy(col("g")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("pcnt")).over(Window.partitionBy(col("g"))))
      .select("g", "bkt", "off", "n")
    bucketed
      .withColumn("lcum", sum(col("cnt")).over(
        Window.partitionBy(col("g"), col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offsets), Seq("g", "bkt"))
      .withColumn("cum", col("lcum") + col("off"))
      .select("g", "v", "cnt", "cum", "n")
  }
}
