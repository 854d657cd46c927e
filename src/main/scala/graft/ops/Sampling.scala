package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling. `df.sample()` draws from a
  * partition-seeded RNG: the sample CHANGES whenever partitioning
  * changes (repartition, AQE coalesce, a different cluster size), and
  * no off-engine oracle can replicate it. Keyed hash sampling decides
  * per ROW from a stable key — reproducible run-to-run, engine-to-
  * engine, and under any repartitioning, which is what a training-data
  * pipeline needs (resumable sharding, holdout splits that survive
  * re-layout).
  *
  * The hash is the portable multiplicative congruence
  * ((key·2654435761 + salt) mod (2^31−1)) — exact in 64-bit integer
  * arithmetic for keys below ~3.4e9 (document this bound rather than
  * silently wrapping; 100 TB corpora should key on a 31-bit-bucketed
  * id or shard first). A row survives iff hash mod den < num.
  */
object Sampling {

  val HashA = 2654435761L
  val HashP = 2147483647L

  /** Portable sampling hash of a long key column. */
  def sampleHash(key: Column, salt: Long): Column =
    pmod(key.cast("long") * HashA + salt, lit(HashP))

  /** Keep rows with hash(key) mod den < num (a num/den rate). */
  def hashSample(df: DataFrame, keyCol: String, num: Int, den: Int,
      salt: Long = 0L): DataFrame =
    df.filter(pmod(sampleHash(col(keyCol), salt), lit(den.toLong)) < num.toLong)

  /** Weight-proportional sampling: row i survives with probability
    * `rate · w_i / max(w)` — the quality-weighted subsample a training
    * mix needs (keep more of what scores well) with none of the
    * nondeterminism of RNG thinning. The keep rule is pure integer
    * cross-multiplication over FIXED-POINT weights
    * (wS = floor(w · 2^20), so fractional quality scores in (0,1)
    * keep their proportionality instead of truncating to 0):
    *
    *   (hash(key) mod M) · max(wS) · den  <  wS_i · M · num
    *
    * so the kept set is bit-stable across engines and partitionings.
    * For integer weights the fixed-point scaling cancels exactly —
    * the kept set equals the unscaled rule's. max(wS) is a 1-row
    * aggregate broadcast back via cross join. Rows with w ≤ 0 never
    * survive; `rate = num/den` is the rate applied to maximum-weight
    * rows. Weights must satisfy max(w)·den < 2^22 (≈4.2M — far above
    * quality scores or token counts; rescale first for byte-length-
    * sized weights) or the 64-bit cross product would overflow; the
    * predicate fail-fasts via assert_true rather than silently
    * mis-sampling. NULL-weight rows never survive, and a frame whose
    * weights are all NULL (or empty) yields an empty sample, not an
    * error.
    */
  def weightedHashSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      num: Int,
      den: Int,
      salt: Long = 0L): DataFrame = {
    val m = 1L << 20
    def scaled(c: Column): Column = floor(c.cast("double") * m.toDouble).cast("long")
    val maxW = df.agg(max(scaled(col(weightCol))).as("__maxw"))
    // NULL __maxw (empty frame, or every weight NULL) must fall
    // through to the `__maxw > 0` filter (empty result, the pre-guard
    // behavior) — assert_true(NULL) would throw, so coalesce the
    // comparison itself to true
    val guard = assert_true(
      coalesce(col("__maxw") <= lit((1L << 42) / den.toLong), lit(true)),
      lit(s"weightedHashSample: max(weight)*den must stay below 2^22 " +
        "(scaled max(weight)*2^20*den reaches the 2^63 cross-product " +
        "ceiling past that) — pre-bucket or rescale weights"))
    df.crossJoin(broadcast(maxW))
      .filter(guard.isNull && col("__maxw") > 0L &&
        pmod(sampleHash(col(keyCol), salt), lit(m)) * col("__maxw") * den.toLong <
          scaled(col(weightCol)) * m * num.toLong)
      .drop("__maxw")
  }

  /** Leakage-safe train/validation/test label from a long GROUP key:
    * every row sharing the key lands in the same split, so duplicates
    * (or any other grouping — host, author, dedup cluster) can never
    * straddle a split boundary and leak evaluation data into training.
    * Key on the group's representative id (e.g. min doc_id per
    * content digest) rather than the row id. Fractions are
    * numerators over `den`: train gets [0, numTrain), validation
    * [numTrain, numTrain+numVal), test the rest. Pure arithmetic on
    * the row — no shuffle, no RNG, bit-stable across engines.
    */
  def splitLabel(groupKey: Column, numTrain: Int, numVal: Int, den: Int,
      salt: Long = 0L): Column = {
    require(numTrain > 0 && numVal >= 0 && numTrain + numVal < den,
      "need 0 < numTrain and numTrain+numVal < den (test must be non-empty)")
    val h = pmod(sampleHash(groupKey, salt), lit(den.toLong))
    when(h < numTrain.toLong, "train")
      .when(h < (numTrain + numVal).toLong, "validation")
      .otherwise("test")
  }

  /** Per-stratum rates: rate (num, den) per stratum value, fallback
    * rate for strata not listed. One predicate, no shuffle — stratified
    * sampling here is a filter, not a groupBy.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, (Int, Int)],
      defaultRate: (Int, Int),
      salt: Long = 0L): DataFrame = {
    val h = sampleHash(col(keyCol), salt)
    val keep = rates.toSeq.sortBy(_._1).foldRight(
      pmod(h, lit(defaultRate._2.toLong)) < defaultRate._1.toLong: Column) {
      case ((stratum, (num, den)), els) =>
        when(col(strataCol) === stratum, pmod(h, lit(den.toLong)) < num.toLong)
          .otherwise(els)
    }
    df.filter(keep)
  }

  /** Rebalance a corpus to a TARGET class mixture — the data-mixing
    * step of a training pipeline ("50% web, 30% books, 20% code"),
    * downsampling only (never duplicating rows). Classes get integer
    * weights; with W = Σw the achievable total is maximized subject to
    * no class oversampling: T = min_c ⌊n_c·W/w_c⌋, per-class target
    * t_c = ⌊w_c·T/W⌋, and rows are kept by the deterministic hash
    * predicate at rate t_c/n_c (fixed-point threshold
    * ⌊t_c·2^20/n_c⌋ — the binding class keeps everything exactly).
    * Classes absent from `weights` (or weighted 0) are dropped.
    *
    * Scale shape: the class-count pass scans ONLY the class column
    * (parquet column pruning) into a tiny aggregate; thresholds flow
    * back as a broadcast join — no driver collect, no shuffle of the
    * corpus itself, and the keep test is one codegen'd comparison per
    * row. Everything is exact integer arithmetic: the kept set is
    * bit-stable across engines and partitionings.
    */
  /** Temperature-flattened domain mixing at α = 1/2 — the standard
    * "raise domain counts to a power < 1" rebalance of multilingual /
    * multi-domain training mixes (big domains downsampled toward
    * √-proportional mass, the smallest domain kept whole):
    * keep rate for a domain with n rows is √(n_min / n), applied as
    * the fixed-point hash threshold ⌊2^20·√(n_min/n)⌋.
    *
    * α is pinned to 1/2 ON PURPOSE: IEEE-754 requires sqrt (and the
    * division feeding it) to be exactly rounded, so the integer
    * threshold is bit-identical on every engine — a general pow(n, α)
    * is only faithfully rounded and may flip a threshold by one ulp
    * between libm implementations, silently moving rows across the
    * keep boundary. For other temperatures, precompute thresholds
    * off-engine and use [[stratifiedHashSample]].
    *
    * Scale shape: same as [[mixToTarget]] — a column-pruned count
    * aggregate, thresholds broadcast back, one codegen'd comparison
    * per row; no corpus shuffle, no RNG.
    */
  def temperatureMixSqrt(
      df: DataFrame,
      keyCol: String,
      classCol: String,
      salt: Long = 0L): DataFrame = {
    val d = 1L << 20
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val minRow = counts.agg(min(col("__n")).as("__nmin"))
    val thr = counts.crossJoin(broadcast(minRow))
      .select(col(classCol),
        floor(lit(d.toDouble) *
          sqrt(col("__nmin").cast("double") / col("__n").cast("double")))
          .cast("long").as("__thr"))
    df.join(broadcast(thr), Seq(classCol))
      .filter(pmod(sampleHash(col(keyCol), salt), lit(d)) < col("__thr"))
      .drop("__thr")
  }

  def mixToTarget(
      df: DataFrame,
      keyCol: String,
      classCol: String,
      weights: Map[String, Long],
      salt: Long = 0L): DataFrame = {
    require(weights.nonEmpty, "mixToTarget needs at least one class weight")
    require(weights.values.forall(_ >= 0L), "class weights must be non-negative")
    val w = weights.values.sum
    require(w > 0L, "at least one class weight must be positive")
    val d = 1L << 20
    val wMap = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", element_at(wMap, col(classCol)))
      .filter(col("__w").isNotNull && col("__w") > 0L)
    val tRow = counts.agg(min(expr(s"__n * $w div __w")).as("__t"))
    val thr = counts.crossJoin(broadcast(tRow))
      .select(col(classCol),
        expr(s"((__w * __t div $w) * $d) div __n").as("__thr"))
    df.join(broadcast(thr), Seq(classCol))
      .filter(pmod(sampleHash(col(keyCol), salt), lit(d)) < col("__thr"))
      .drop("__thr")
  }

  /** EXACT-count stratified sampling: keep precisely
    * ⌊n_g · num/den⌋ rows of every stratum — the hash-threshold
    * samplers above hit their rate only in expectation, which is not
    * good enough when a benchmark or eval split must have exact
    * per-class sizes. The kept set is the quota_g smallest sampling
    * hashes per stratum: deterministic, order-free, stable under any
    * re-layout — and because the hash is a bijection on [0, 2³¹−1),
    * distinct keys never collide and the count is exact, not
    * approximate.
    *
    * Scale shape: the per-stratum rank threshold is read from the
    * same two-phase cumulative distribution as the exact quantiles
    * ([[Quantiles.cumDist]] — parallelism independent of stratum
    * count, never a per-stratum single-task sort), broadcast back,
    * and the keep test is a shuffle-free filter on the original scan.
    *
    * Keys must be unique and in [0, 2³¹−1).
    */
  def exactQuotaSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      num: Int,
      den: Int,
      salt: Long = 0L): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, "need 0 <= num/den <= 1")
    val h = sampleHash(col(keyCol), salt)
    val thr = Quantiles.cumDist(df, col(stratumCol), h)
      .groupBy(col("g").as(stratumCol))
      .agg(min(when(
        expr(s"(n * $num) div $den") >= 1L &&
          col("cum") >= expr(s"(n * $num) div $den"),
        col("v"))).as("__thr"))
    df.join(broadcast(thr), Seq(stratumCol))
      .filter(h <= col("__thr")) // null threshold (quota 0) keeps nothing
      .drop("__thr")
  }
}
