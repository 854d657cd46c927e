package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap: B independent resample estimates of a grouped
  * statistic in ONE pass over the data — the standard way to put
  * confidence intervals on statistics of datasets too large to
  * resample by shuffling (resampling n rows WITH replacement is
  * infeasible at 100 TB; drawing each row's multiplicity from
  * Poisson(1) per replicate is a row-local decision and converges to
  * the same bootstrap distribution).
  *
  * Determinism (the usual bootstrap is RNG-seeded; this one is
  * replayable anywhere): the multiplicity of row `id` in replicate
  * `b` comes from inverting the Poisson(1) CDF at a portable integer
  * hash of (id, b) — the same no-RNG sampling discipline as
  * [[Sampling]] and [[Graphs.deterministicWalks]]. The CDF
  * thresholds are pre-multiplied into integer literals, so weight
  * assignment never touches a float; replicate means are exact
  * cent-sums with a single closing double division. Bit-identical
  * under any partitioning, re-run, or engine.
  *
  * Scale shape: explode ×B then aggregate — but the partial (map-
  * side) aggregation collapses every partition to ≤ B rows before
  * the one tiny shuffle, so the exploded frame never hits the wire.
  * Work is B passes of codegen'd arithmetic over the scan, memory is
  * O(B) per task.
  */
object Bootstrap {

  val P: Long = 2147483647L
  val HashA: Long = 1610612741L
  val HashB: Long = 805306457L
  val HashA2: Long = 1566083941L
  val HashB2: Long = 12345L
  val IdMix: Long = 131071L
  val BMix: Long = 524287L

  /** Poisson(1) CDF pre-multiplied by P: weight k is assigned when
    * the [0,P) hash falls below `Thresholds(k)`; ≥ last ⇒ weight 8
    * (P(X>7) ≈ 1e-5). Computed once here and interpolated verbatim
    * into the oracle SQL, so both engines compare against the same
    * integer literals.
    */
  val Thresholds: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val pmf = (0 to 7).scanLeft(e1) { case (p, k) => p / (k + 1) }.take(8)
    pmf.scanLeft(0.0)(_ + _).drop(1).map(c => (c * P).toLong)
  }

  /** The [0,P) portable hash of (id, b). */
  def hash(id: Column, b: Column): Column = {
    val v = pmod(id * IdMix + b * BMix, lit(P))
    val x = pmod(lit(HashA) * v + lit(HashB), lit(P))
    pmod(pmod(x * x, lit(P)) * lit(HashA2) + lit(HashB2), lit(P))
  }

  /** Pseudo-Poisson(1) multiplicity of (id, b): inverse-CDF lookup
    * on the integer hash via a chained comparison ladder (codegen'd,
    * branch-per-threshold).
    */
  def weight(id: Column, b: Column): Column = {
    val y = hash(id, b)
    Thresholds.zipWithIndex.foldRight(lit(8L): Column) {
      case ((t, k), rest) => when(y < t, k.toLong).otherwise(rest)
    }
  }

  /** B resample means of `valueCol` (cent-quantized): one row per
    * replicate — (b BIGINT, n_eff BIGINT, mean_value DOUBLE). The
    * spread of `mean_value` across replicates IS the bootstrap
    * sampling distribution of the mean; callers derive CIs from it.
    * `idCol` must identify rows uniquely (it seeds the multiplicity
    * hash).
    */
  def poissonBootstrapMeans(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      resamples: Int): DataFrame = {
    require(resamples >= 1, "resamples must be positive")
    val cents = floor(col(valueCol).cast("double") * 100.0).cast("long")
    df.select(col(idCol).cast("long").as("id"), cents.as("cents"))
      .select(col("id"), col("cents"),
        explode(sequence(lit(0L), lit(resamples - 1L))).as("b"))
      .withColumn("w", weight(col("id"), col("b")))
      .groupBy("b")
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("cents")).as("swc"))
      .select(col("b"), col("n_eff"),
        (col("swc").cast("double") / col("n_eff").cast("double") / lit(100.0))
          .as("mean_value"))
  }
}
