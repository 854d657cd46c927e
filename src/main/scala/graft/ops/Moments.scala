package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Higher-moment statistics from EXACT integer power sums — the
  * distributed-statistics discipline already used by
  * [[graft.ops.Regression.olsFit]]: every sufficient statistic is an
  * exact BIGINT/DECIMAL fold (order-free, partial-combining), and the
  * floating-point arithmetic happens once, at the end, in an
  * expression written identically in the DuckDB oracle. Spark's own
  * `skewness`/`kurtosis` use streaming co-moment updates whose float
  * results depend on partition order — unusable for cross-engine
  * hash verification and subtly nondeterministic run-to-run at scale;
  * raw power sums of integral values are neither.
  *
  * Scale shape: each statistic is ONE hash aggregation —
  * `partial_sum` per partition, merge, constant-time finish. The
  * shuffle carries a handful of longs per group per partition
  * regardless of row count. No window, no sort, no second pass (a
  * textbook two-pass central-moment computation would re-scan the
  * input; the raw-moment identities trade that for wider integers).
  *
  * Extends the reference's aggregation surface (SURVEY.md §2.4 has
  * only min/count; `/root/reference/main.py:513-518`) toward the
  * profiling/statistics layer a training-data pipeline needs.
  */
object Moments {

  /** Skewness and excess kurtosis per group of an integral-valued
    * column (values must fit comfortably in a long when raised to the
    * 4th power — e.g. quantities, counts, small measures; for cents-
    * scale values see [[welchTTest]] which needs only 2nd moments).
    *
    * Raw-moment identities (μ = S1/n):
    * {{{
    *   m2 = S2/n − μ²
    *   m3 = S3/n − 3μ·S2/n + 2μ³
    *   m4 = S4/n − 4μ·S3/n + 6μ²·S2/n − 3μ⁴
    *   skew = m3 / (m2·√m2),  kurt_excess = m4/m2² − 3
    * }}}
    *
    * @return (group, n, mean, variance, skew, kurt_excess)
    */
  def momentsByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    df.select(col(groupCol).as("g"), x.as("x"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("s1"),
        sum(col("x") * col("x")).cast("double").as("s2"),
        sum(col("x") * col("x") * col("x")).cast("double").as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).cast("double").as("s4"))
      .select(col("g"), col("n"),
        expr("s1/n").as("mean"),
        expr("s2/n - (s1/n)*(s1/n)").as("variance"),
        expr("""CASE WHEN s2/n - (s1/n)*(s1/n) <= 0.0 THEN 0.0
                ELSE (s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n)) /
                     ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n)))
                END""").as("skew"),
        expr("""CASE WHEN s2/n - (s1/n)*(s1/n) <= 0.0 THEN 0.0
                ELSE (s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                        - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n)) /
                     ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0
                END""").as("kurt_excess"))
  }

  /** Jarque-Bera normality statistic per group, assembled on top of
    * [[momentsByGroup]]'s exact-power-sum skew/kurtosis:
    * JB = n/6·(skew² + kurt_excess²/4). Large JB says the residual
    * or measure is not normal — the gate before z-score thresholds
    * and parametric intervals are trusted. Adds zero passes: one
    * closing expression over the per-group moments row, token-shared
    * with the oracle ([[JbExpr]]).
    *
    * @return (group, n, skew, kurt_excess, jb_stat)
    */
  def jarqueBera(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame =
    momentsByGroup(df, groupCol, valueCol)
      .select(col("g"), col("n"), col("skew"), col("kurt_excess"),
        expr(JbExpr).as("jb_stat"))

  /** Shared Spark↔oracle closing expression for [[jarqueBera]]. */
  val JbExpr: String =
    """CAST(n AS DOUBLE)/6.0
       * (skew*skew + kurt_excess*kurt_excess/4.0)"""

  /** Welch's unequal-variance t-test between two groups, from exact
    * fixed-point (cents) first and second moments. One aggregation
    * over the filtered input produces both groups' statistics
    * (conditional sums — no self-join, no two scans); the t statistic
    * and Welch–Satterthwaite degrees of freedom are closed-form on
    * the merged row. Second powers of cents exceed long range when
    * summed, so the power sums fold in DECIMAL(38,0) — still exact,
    * still order-free.
    *
    * @return one row: (n_a, n_b, mean_a, mean_b, t_stat, df)
    */
  def welchTTest(
      df: DataFrame,
      groupCol: String,
      groupA: String,
      groupB: String,
      valueCol: String): DataFrame = {
    val xq = floor(col(valueCol).cast("double") * 100).cast("decimal(18,0)")
    val isA = col(groupCol) === lit(groupA)
    val two = df.filter(isA || col(groupCol) === lit(groupB))
      .select(isA.as("a"), xq.as("x"))
    two.agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("a"), col("x")).otherwise(lit(0).cast("decimal(18,0)")))
          .cast("double").as("sa"),
        sum(when(!col("a"), col("x")).otherwise(lit(0).cast("decimal(18,0)")))
          .cast("double").as("sb"),
        sum(when(col("a"), col("x") * col("x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).cast("double").as("saa"),
        sum(when(!col("a"), col("x") * col("x"))
          .otherwise(lit(0).cast("decimal(38,0)"))).cast("double").as("sbb"))
      .select(col("n_a"), col("n_b"),
        expr("sa/n_a/100.0").as("mean_a"),
        expr("sb/n_b/100.0").as("mean_b"),
        expr("""(sa/n_a - sb/n_b) /
                sqrt((saa - sa*sa/n_a)/(n_a - 1)/n_a +
                     (sbb - sb*sb/n_b)/(n_b - 1)/n_b)""").as("t_stat"),
        expr("""((saa - sa*sa/n_a)/(n_a - 1)/n_a +
                 (sbb - sb*sb/n_b)/(n_b - 1)/n_b) *
                ((saa - sa*sa/n_a)/(n_a - 1)/n_a +
                 (sbb - sb*sb/n_b)/(n_b - 1)/n_b) /
                (((saa - sa*sa/n_a)/(n_a - 1)/n_a) *
                 ((saa - sa*sa/n_a)/(n_a - 1)/n_a) / (n_a - 1) +
                 ((sbb - sb*sb/n_b)/(n_b - 1)/n_b) *
                 ((sbb - sb*sb/n_b)/(n_b - 1)/n_b) / (n_b - 1))""").as("df"))
  }

  /** Spearman rank correlation per group between two measures, with
    * proper average ranks for ties kept EXACT by working in doubled
    * ranks: `2·rank(v) = 2·|{u < v}| + |{u = v}| + 1` is an integer,
    * so the Pearson-on-ranks sufficient statistics are exact integer
    * folds (DECIMAL(38,0) — doubled ranks reach 2n and their products
    * n², past long range at billions of rows) and the final r is one
    * deterministic double expression.
    *
    * Shape: each measure's rank frame is [[Quantiles.cumDist]] — the
    * scale-safe two-phase cumulative distribution over DISTINCT
    * values (parallelism = groups × buckets, never one task per
    * group) — from which the doubled average rank is the closed form
    * `2·cum − cnt + 1`. Rank lookup is two equi-joins against those
    * distinct-value frames (orders of magnitude below the input),
    * then one final partial-combining hash aggregation.
    *
    * `xExpr`/`yExpr` must be integer-safe expressions of the input
    * (e.g. a quantity cast to long, money in cents).
    *
    * @return (group, n, rho)
    */
  def spearmanByGroup(
      df: DataFrame,
      groupCol: String,
      xExpr: org.apache.spark.sql.Column,
      yExpr: org.apache.spark.sql.Column): DataFrame = {
    // one scan: the projected (g, xv, yv) base feeds BOTH cumDist
    // rank frames and the rank-lookup join. At sf0.1 this is
    // time-neutral (2.4 s either way — the cost is the rank-lookup
    // shuffle join against the near-unique price rank frame, not the
    // 3-column scans), but at 100 TB re-reading the source three
    // times loses to caching the projection.
    val base = df
      .select(col(groupCol).as("g"), xExpr.as("xv"), yExpr.as("yv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def doubledRanks(c: String, out: String): DataFrame =
      Quantiles.cumDist(base, col("g"), col(c))
        .select(col("g"), col("v"),
          (col("cum") * 2L - col("cnt") + 1L).as(out))

    val rx = doubledRanks("xv", "rx")
    val ry = doubledRanks("yv", "ry")
    val ranked = base
      .join(rx.withColumnRenamed("v", "xv"), Seq("g", "xv"))
      .join(ry.withColumnRenamed("v", "yv"), Seq("g", "yv"))
      .select(col("g"),
        col("rx").cast("decimal(18,0)").as("rx"),
        col("ry").cast("decimal(18,0)").as("ry"))
    ranked
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx")).cast("double").as("sx"),
        sum(col("ry")).cast("double").as("sy"),
        sum(col("rx") * col("rx")).cast("double").as("sxx"),
        sum(col("ry") * col("ry")).cast("double").as("syy"),
        sum(col("rx") * col("ry")).cast("double").as("sxy"))
      .select(col("g"), col("n"),
        expr("""CASE WHEN n*sxx - sx*sx = 0.0 OR n*syy - sy*sy = 0.0
                THEN 0.0
                ELSE (n*sxy - sx*sy) /
                     (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
                END""").as("rho"))
  }

  /** Deterministic ±1 hash family for [[amsF2]]: σ_j(x) =
    * 1 − 2·((a_j·(x mod P) + b_j) mod P mod 2), P = 2^31 − 1 (the
    * MinHash modulus — same overflow headroom argument). The (a, b)
    * constants derive from fixed primes so the ORACLE generates the
    * identical family from this very Seq.
    */
  val AmsAB: Seq[(Long, Long)] = (0 until 32).map { j =>
    ((2L * j + 3L) * 15485863L % Dedup.MinHashP,
      (j + 1L) * 32452843L % Dedup.MinHashP)
  }
  // The family above is DETERMINISTIC (fixed affine-mod-2 constants)
  // so the DuckDB oracle can regenerate it token-identically — which
  // means the formal AMS variance bound (it needs 4-wise-independent
  // RANDOM signs) is NOT claimed here: the estimate quality is
  // empirical, and the exact F2 anchor emitted next to the estimate
  // is what makes the actual error observable per run.

  /** AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996)
    * priced against the exact F2 = Σ_k f_k² — the self-join-size /
    * skew estimator every shuffle planner wants without scanning
    * twice: 32 counters c_j = Σ_k f_k·σ_j(k) with deterministic
    * affine-mod-2 ±1 signs (see [[AmsAB]] — reproducible for the
    * oracle, so the AMS 4-wise-independence variance bound is NOT
    * claimed; the exact anchor prices the actual error), estimate =
    * median of c_j² (average of the two middle order statistics).
    * Exactness discipline: counters are exact
    * integer folds over the per-key count frame (ONE input scan; the
    * sketch and the exact anchor both read that frame), the squares
    * and the median read in double with both engines sorting the
    * same exact integers. c_j² in double is exact while |c_j| < 2²⁶
    * (n < 67M); beyond that the estimate itself is approximate by
    * construction and the rounding is immaterial.
    *
    * @return one row: (n, n_keys, f2_exact, f2_est, est_ratio)
    */
  def amsF2(
      df: DataFrame,
      keyExpr: org.apache.spark.sql.Column,
      counters: Int = 32): DataFrame =
    amsF2FromPartials(
      df.groupBy(keyExpr.as("k")).agg(count(lit(1)).as("f")), counters)

  /** Fold a micro-batch's per-key counts into stored (k, f) partials
    * — the [[graft.streaming.EventStreams.smoothedRatesFold]] shape
    * for the F2 sketch: counts are order-free integers, so
    * [[amsF2FromPartials]] over the fold after batch n is BIT-EQUAL
    * to [[amsF2]] over the union of batches 1..n, any arrival order,
    * any batch boundaries (the counters are linear in f). The
    * streaming twin of the sketch, without approximation on top of
    * the sketch's own.
    */
  def amsF2Fold(
      stored: DataFrame, // (k, f) — empty on the first batch
      batch: DataFrame,
      keyExpr: org.apache.spark.sql.Column): DataFrame =
    stored
      .unionAll(batch.groupBy(keyExpr.as("k")).agg(count(lit(1)).as("f")))
      .groupBy("k").agg(sum(col("f")).as("f"))

  /** Close the sketch + exact anchor over a per-key count frame.
    *
    * Key contract: `k` must cast to a non-null long for EVERY row —
    * a non-numeric key would otherwise silently drop out of the sign
    * counters while still counting in n/n_keys/f2_exact, skewing
    * f2_est/est_ratio with no error — so the cast is guarded by
    * `raise_error`. Keys should also be NON-NEGATIVE for the
    * cross-engine contract: Spark's pmod is mirrored by DuckDB's
    * signed `%` only on non-negative operands (hash a signed key
    * first, as the unit test does).
    */
  def amsF2FromPartials(
      perKey: DataFrame, // (k, f)
      counters: Int = 32): DataFrame = {
    require(counters >= 2 && counters % 2 == 0 && counters <= AmsAB.size,
      s"counters must be even and <= ${AmsAB.size}")
    val p = Dedup.MinHashP
    // try_cast, not cast: under ANSI a malformed key would throw a
    // generic CAST error, under non-ANSI it would NULL out silently —
    // this guard makes the key contract explicit in both modes (and
    // catches genuinely NULL keys, which cast alone never errors on)
    val kTry = expr("try_cast(k AS BIGINT)")
    val kl = when(kTry.isNotNull, kTry)
      .otherwise(raise_error(concat(
        lit("amsF2 requires a non-null numeric key; got: "),
        coalesce(col("k").cast("string"), lit("NULL")))))
    val kp = pmod(kl, lit(p))
    val sigSums = (0 until counters).map { j =>
      val (a, b) = AmsAB(j)
      sum((lit(1L) - lit(2L) * ((lit(a) * kp + lit(b)) % lit(p) % lit(2L)))
        * col("f")).as(s"c$j")
    }
    val aggs = Seq(
      sum(col("f")).as("n"),
      count(lit(1)).as("n_keys"),
      sum(col("f").cast("decimal(18,0)") * col("f").cast("decimal(18,0)"))
        .as("f2x")) ++ sigSums
    val ests = array_sort(array((0 until counters).map { j =>
      col(s"c$j").cast("double") * col(s"c$j").cast("double")
    }: _*))
    perKey
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("arr", ests)
      .select(col("n"), col("n_keys"),
        col("f2x").cast("double").as("f2_exact"),
        ((element_at(col("arr"), counters / 2)
          + element_at(col("arr"), counters / 2 + 1)) / 2.0).as("f2_est"))
      .withColumn("est_ratio", col("f2_est") / col("f2_exact"))
  }

}
