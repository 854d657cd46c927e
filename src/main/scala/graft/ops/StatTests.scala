package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-comparison statistics from EXACT integer sufficient
  * statistics — the [[Moments]] discipline applied to the rank/CDF
  * family: Mann-Whitney U (with its AUC reading), the two-sample
  * Kolmogorov-Smirnov D, Kendall's tau-b, and the Gini coefficient.
  *
  * Everything before the final closed-form expression is an integer
  * (BIGINT / bounded DECIMAL) fold over DISTINCT-value frames, so
  * results hash-verify cross-engine and are partition-order
  * invariant. Ranks come from [[Quantiles.cumDist]] — the two-phase
  * bucketed cumulative distribution whose parallelism is
  * groups × buckets, never one task per group — and every "global"
  * statistic folds map-side first (the shuffle carries one row per
  * distinct value or per cell, regardless of input row count).
  *
  * DECIMAL operand precisions are sized so every product stays ≤ 38
  * digits in BOTH engines (DuckDB types products at p1+p2 and errors
  * past 38; Spark caps at 38 silently): counts ride as DECIMAL(12,0),
  * doubled ranks as DECIMAL(14,0), cent values as DECIMAL(10,0).
  * Bounds hold to ~1e12 rows / 1e10-cent values; past that, widen the
  * operands and split the products (the sums themselves stay exact).
  *
  * Extends the reference's aggregation surface (SURVEY.md §2.4;
  * `/root/reference/main.py:513-518` has only min/count) toward the
  * dataset-comparison layer a training-data pipeline needs: "did this
  * scrape's quality distribution shift vs last month's" is exactly a
  * rank-sum / KS question.
  */
object StatTests {

  /** Tie-adjusted AUC from the doubled rank sum: 2U / (2·n_a·n_b). */
  val AucExpr: String =
    """(two_ra - CAST(n_a AS DOUBLE)*(CAST(n_a AS DOUBLE) + 1.0)) /
       (2.0*CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE))"""

  /** Normal-approximation z with the tie-corrected variance:
    * z = 2(U−μ) / 2σ, σ² = n_a·n_b/12·((n+1) − T/(n(n−1))). */
  val MwZExpr: String =
    """(two_ra - CAST(n_a AS DOUBLE)*(CAST(n_a AS DOUBLE) + 1.0)
         - CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)) /
       sqrt(CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)/3.0*
            ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
             - tie_t/((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                      *(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))))"""

  /** Mann-Whitney rank-sum test between two groups of an
    * integer-safe measure, with proper average ranks for ties
    * (doubled ranks `2·cum − cnt + 1` stay integral) and the
    * tie-corrected normal z. The AUC column is the probability-of-
    * superiority reading of the same U — i.e. this is also the exact
    * ROC-AUC of `valueExpr` as a score for membership in `gA`.
    *
    * Shape: ONE scan folds to per-(side, value) cells; pooled ranks
    * come from [[Quantiles.cumDist]] over the cell frame (input rows
    * never rank individually); the tie term folds as
    * Σ c·(cnt²−1) = Σ_v cnt³−cnt without a second distinct pass.
    *
    * @return one row: (n_a, n_b, auc, z)
    */
  def mannWhitney(
      df: DataFrame,
      groupCol: String,
      gA: String,
      gB: String,
      valueExpr: Column): DataFrame = {
    val cells = df
      .filter(col(groupCol).isin(gA, gB))
      .select((col(groupCol) === gA).as("a"), valueExpr.as("v"))
      .groupBy("a", "v").agg(count(lit(1)).as("c"))
    val ranks = Quantiles
      .cumDist(cells, lit(0), col("v"), col("c"))
      .select(col("v"), col("cnt"),
        (col("cum") * 2L - col("cnt") + 1L).as("dr"))
    cells.join(ranks, Seq("v"))
      .select(col("a"),
        col("c").cast("decimal(12,0)").as("c"),
        col("dr").cast("decimal(14,0)").as("dr"),
        col("cnt").cast("decimal(12,0)").as("cnt"))
      .agg(
        sum(when(col("a"), col("c")).otherwise(lit(0))).cast("long").as("n_a"),
        sum(when(!col("a"), col("c")).otherwise(lit(0))).cast("long")
          .as("n_b"),
        sum(when(col("a"), col("c") * col("dr")).otherwise(lit(0)))
          .cast("double").as("two_ra"),
        sum(col("c") * (col("cnt") * col("cnt") - 1)).cast("double")
          .as("tie_t"))
      .select(col("n_a"), col("n_b"),
        expr(AucExpr).as("auc"), expr(MwZExpr).as("z"))
  }

  /** Two-sample Kolmogorov-Smirnov: D = max_v |F_a(v) − F_b(v)|,
    * exact as max |cum_a·n_b − cum_b·n_a| / (n_a·n_b) over the pooled
    * distinct-value grid. Both groups' CDFs ride ONE bucketed
    * two-phase prefix pass (the [[Quantiles.cumDist]] shape with a
    * weight column per side), so the only full-input work is the
    * per-(value) conditional-count aggregation.
    *
    * @return one row: (n_a, n_b, d, ks_stat) where
    *         ks_stat = d·√(n_a·n_b/(n_a+n_b))
    */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      gA: String,
      gB: String,
      valueExpr: Column): DataFrame = {
    val nB = df.sparkSession.sessionState.conf.numShufflePartitions
    val dist = df
      .filter(col(groupCol).isin(gA, gB))
      .select((col(groupCol) === gA).as("a"), valueExpr.as("v"))
      .groupBy("v")
      .agg(
        sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranges = dist.agg(min("v").as("vmin"), max("v").as("vmax"))
    // bucket fully in double — operands cast BEFORE subtracting, so
    // neither (v - vmin) nor the (vmax - vmin + 1) denominator can
    // wrap on value spans ≥ 2^63; buckets only need weak monotonicity
    // in v (see Quantiles.cumDist), which the double form preserves
    val bucketed = dist.crossJoin(broadcast(ranges))
      .withColumn("bkt",
        ((col("v").cast("double") - col("vmin").cast("double")) * nB /
          (col("vmax").cast("double") - col("vmin").cast("double") + 1.0d))
          .cast("long"))
    val offsets = bucketed.groupBy("bkt")
      .agg(sum("ca").as("pa"), sum("cb").as("pb"))
      .withColumn("offa", coalesce(
        sum(col("pa")).over(Window.partitionBy(lit(0)).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("offb", coalesce(
        sum(col("pb")).over(Window.partitionBy(lit(0)).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_a", sum(col("pa")).over(Window.partitionBy(lit(0))))
      .withColumn("n_b", sum(col("pb")).over(Window.partitionBy(lit(0))))
      .select("bkt", "offa", "offb", "n_a", "n_b")
    bucketed
      .withColumn("la", sum(col("ca")).over(
        Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("lb", sum(col("cb")).over(
        Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offsets), Seq("bkt"))
      .select(col("n_a"), col("n_b"),
        abs((col("la") + col("offa")).cast("decimal(18,0)") *
            col("n_b").cast("decimal(18,0)") -
          (col("lb") + col("offb")).cast("decimal(18,0)") *
            col("n_a").cast("decimal(18,0)")).as("dnum"))
      .groupBy("n_a", "n_b")
      .agg(max("dnum").as("dnum"))
      .select(col("n_a"), col("n_b"),
        expr("""CAST(dnum AS DOUBLE) /
                (CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE))""").as("d"),
        expr("""CAST(dnum AS DOUBLE) /
                (CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE)) *
                sqrt(CAST(n_a AS DOUBLE)*CAST(n_b AS DOUBLE) /
                     (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))""")
          .as("ks_stat"))
  }

  /** Kendall's tau-b between two BOUNDED-cardinality integer-safe
    * measures, computed on the contingency table: concordant /
    * discordant pair totals are Σ c₁·c₂ over cell pairs, so the
    * quadratic work is |X|·|Y| squared CELLS (e.g. 50×7 here), never
    * input pairs. The cell self-join is a broadcast nested-loop by
    * construction — allowlisted in PlanSpec with the codebook-sized
    * frames; for high-cardinality measures, bin first.
    *
    * tau_b = 2(C−D) / √((n(n−1)−T_x)(n(n−1)−T_y)),
    * T_x = Σ_x c_x(c_x−1) (and symmetrically T_y).
    *
    * @return one row: (n, concordant, discordant, tau_b)
    */
  def kendallTauB(
      df: DataFrame,
      xExpr: Column,
      yExpr: Column): DataFrame = {
    val cells = df.select(xExpr.as("x"), yExpr.as("y"))
      .groupBy("x", "y").agg(count(lit(1)).cast("decimal(14,0)").as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cells
      .join(broadcast(cells.select(col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2"))),
        col("x") < col("x2") && col("y") =!= col("y2"))
      .agg(
        sum(when(col("y") < col("y2"), col("c") * col("c2"))
          .otherwise(lit(0))).cast("double").as("conc"),
        sum(when(col("y") > col("y2"), col("c") * col("c2"))
          .otherwise(lit(0))).cast("double").as("disc"))
    val tx = cells.groupBy("x").agg(sum("c").as("cx"))
      .agg(sum(col("cx") * (col("cx") - 1)).cast("double").as("tie_x"))
    val ty = cells.groupBy("y").agg(sum("c").as("cy"))
      .agg(sum(col("cy") * (col("cy") - 1)).cast("double").as("tie_y"))
    val nn = cells.agg(sum(col("c")).cast("long").as("n"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(nn))
      .select(col("n"),
        col("conc").cast("long").as("concordant"),
        col("disc").cast("long").as("discordant"),
        expr("""2.0*(conc - disc) /
                sqrt((CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0) - tie_x)
                   * (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0) - tie_y))""")
          .as("tau_b"))
  }

  /** Gini coefficient per group of a non-negative integer-safe
    * measure, tie-adjusted via average ranks:
    * G = 2Σ rᵢxᵢ/(n·Σx) − (n+1)/n, with 2Σ rᵢxᵢ folding exactly as
    * Σ_v v·cnt·(2·cum−cnt+1) over the [[Quantiles.cumDist]]
    * distinct-value frame — no per-row ranking, no global sort.
    *
    * @return (group, n, gini)
    */
  def giniByGroup(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column): DataFrame = {
    Quantiles.cumDist(df, col(groupCol), valueExpr)
      .select(col("g"), col("n"),
        col("v").cast("decimal(10,0)").as("v"),
        col("cnt").cast("decimal(12,0)").as("cnt"),
        (col("cum") * 2L - col("cnt") + 1L).cast("decimal(14,0)").as("dr"))
      .groupBy("g", "n")
      .agg(
        sum(col("v") * col("cnt") * col("dr")).cast("double").as("drx"),
        sum(col("v") * col("cnt")).cast("double").as("sx"))
      .select(col("g"), col("n"),
        expr("""CASE WHEN sx = 0.0 THEN 0.0
                ELSE drx/(CAST(n AS DOUBLE)*sx)
                     - (CAST(n AS DOUBLE) + 1.0)/CAST(n AS DOUBLE)
                END""").as("gini"))
  }

  /** First-significant-digit (Benford) profile of a positive measure:
    * per-digit observed counts and shares against the Benford
    * expectation log₁₀(1+1/d), with the per-digit χ² contribution.
    * The digit is STRING arithmetic on the floored integer — no
    * log-of-double boundary risk cross-engine. One hash aggregation
    * to ≤9 rows; the global-share window rides that 9-row frame
    * (PlanSpec partitionless-window allowlist).
    *
    * @return (digit, n_obs, share, benford, chi2_part)
    */
  def benfordProfile(df: DataFrame, valueExpr: Column): DataFrame = {
    df.select(valueExpr.as("p"))
      .filter(col("p") >= 1)
      .select(substring(floor(col("p")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      .withColumn("n", sum(col("n_obs")).over(Window.partitionBy()))
      .select(col("digit"), col("n_obs"),
        expr("CAST(n_obs AS DOUBLE)/CAST(n AS DOUBLE)").as("share"),
        expr("log10(1.0 + 1.0/CAST(digit AS DOUBLE))").as("benford"),
        expr("""(CAST(n_obs AS DOUBLE)
                  - CAST(n AS DOUBLE)*log10(1.0 + 1.0/CAST(digit AS DOUBLE)))
                *(CAST(n_obs AS DOUBLE)
                  - CAST(n AS DOUBLE)*log10(1.0 + 1.0/CAST(digit AS DOUBLE)))
                /(CAST(n AS DOUBLE)*log10(1.0 + 1.0/CAST(digit AS DOUBLE)))""")
          .as("chi2_part"))
  }

  /** Shared Spark↔oracle fold bodies for [[brownForsythe]]: the
    * between-group and within-group sum-of-squares terms, folded
    * over the per-group (n_g, s, q) stats sorted by group.
    */
  val BfNumTerm: String =
    """CAST(x.n_g AS DOUBLE)
       * (CAST(x.s AS DOUBLE) / CAST(x.n_g AS DOUBLE)
          - CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
       * (CAST(x.s AS DOUBLE) / CAST(x.n_g AS DOUBLE)
          - CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))"""
  val BfDenTerm: String =
    """CAST(x.q AS DOUBLE)
       - CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE) / CAST(x.n_g AS DOUBLE)"""
  val BfFExpr: String =
    """CASE WHEN den = 0.0 OR k <= 1 THEN NULL
       ELSE (CAST(n - k AS DOUBLE) * num) / (CAST(k - 1 AS DOUBLE) * den)
       END"""

  /** Brown-Forsythe test of variance homogeneity (Levene with the
    * MEDIAN center — the robust variant): one-way ANOVA F over the
    * absolute deviations z = |x − med_g|. The gatekeeper before
    * pooled-variance tests (a significant F says Welch, not Student)
    * and a drift check in its own right: variance drift with a
    * stable mean is invisible to the mean-shift monitors.
    *
    * Exactness: group medians are exact rank reads on
    * [[Quantiles.cumDist]]; z is an exact long; the F itself is
    * [[anovaF]] over the deviation frame (Σz / Σz² fold in
    * DECIMAL(38,0); every double expression token-shared with the
    * oracle via [[BfNumTerm]]/[[BfDenTerm]]/[[BfFExpr]]).
    *
    * Scale shape: one cumDist pass for medians (broadcast back), one
    * partial-combining stats agg; the closing fold runs over the
    * k-row collected group frame. The deviation scan reuses the
    * persisted projection rather than re-reading the source.
    *
    * @return 1 row: (k, n, num, den, f_stat)
    */
  def brownForsythe(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), valueExpr.as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = Quantiles.cumDist(base, col("g"), col("v"))
      .groupBy("g")
      .agg(min(when(col("cum") * 2 >= col("n"), col("v"))).as("med"))
    val z = base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("z"))
    anovaF(z, "g", col("z"))
  }

  /** One-way ANOVA F over an integer-safe measure: between-group vs
    * within-group sum of squares of the RAW values — the mean-shift
    * complement of [[brownForsythe]] (which is exactly this fold over
    * median deviations). Per-group sufficient statistics (n_g, Σv,
    * Σv²) fold in DECIMAL(38,0) in ONE partial-combining hash
    * aggregation; the closing doubles assemble in a fold over the
    * k-row group frame SORTED by key, token-shared with the oracle
    * ([[BfNumTerm]]/[[BfDenTerm]]/[[BfFExpr]]).
    *
    * @return 1 row: (k, n, num, den, f_stat)
    */
  def anovaF(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column): DataFrame = {
    val gstats = df.select(col(groupCol).as("g"), valueExpr.as("z"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_g"),
        sum(col("z").cast("decimal(38,0)")).as("s"),
        sum((col("z") * col("z")).cast("decimal(38,0)")).as("q"))
    gstats
      .agg(count(lit(1)).as("k"), sum("n_g").as("n"),
        sum(col("s")).cast("decimal(38,0)").as("sz"),
        sort_array(collect_list(struct(col("g"),
          col("n_g"), col("s"), col("q")))).as("gs"))
      .select(col("k"), col("n"),
        expr(s"""aggregate(gs, CAST(0 AS DOUBLE),
            (a, x) -> a + ($BfNumTerm))""").as("num"),
        expr(s"""aggregate(gs, CAST(0 AS DOUBLE),
            (a, x) -> a + ($BfDenTerm))""").as("den"))
      .select(col("k"), col("n"), col("num"), col("den"),
        expr(BfFExpr).as("f_stat"))
  }

  /** Per-group Kruskal-Wallis H term (2R_g)²/n_g — doubled rank sums
    * keep tie-averaged ranks integral (the [[mannWhitney]] trick).
    */
  val KwTerm: String =
    "CAST(x.r2 AS DOUBLE)*CAST(x.r2 AS DOUBLE)/CAST(x.n_g AS DOUBLE)"

  /** H from the doubled-rank fold with the tie correction:
    * H = [3/(n(n+1))·Σ(2R_g)²/n_g − 3(n+1)] / (1 − T/(n³−n)).
    */
  val KwHExpr: String =
    """CASE WHEN n <= 1 OR tie_t >= CAST(n AS DOUBLE)
              *(CAST(n AS DOUBLE)*CAST(n AS DOUBLE) - 1.0) THEN NULL
       ELSE (3.0*q4/(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 1.0))
             - 3.0*(CAST(n AS DOUBLE) + 1.0))
            / (1.0 - tie_t/(CAST(n AS DOUBLE)
               *(CAST(n AS DOUBLE)*CAST(n AS DOUBLE) - 1.0)))
       END"""

  /** Runs-test z with the exact-integer guards folded in:
    * μ = 2ab/(a+b)+1, σ² = 2ab(2ab−a−b)/((a+b)²(a+b−1)).
    */
  val RunsZExpr: String =
    """CASE WHEN n_up = 0 OR n_down = 0
              OR 2*n_up*n_down <= n_up + n_down THEN NULL
       ELSE (CAST(n_runs AS DOUBLE)
             - (2.0*CAST(n_up AS DOUBLE)*CAST(n_down AS DOUBLE)
                /(CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0))
            / sqrt(2.0*CAST(n_up AS DOUBLE)*CAST(n_down AS DOUBLE)
              *(2.0*CAST(n_up AS DOUBLE)*CAST(n_down AS DOUBLE)
                - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
              /((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                *(CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                *(CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0)))
       END"""

  /** Wald-Wolfowitz runs test per group on a series' up/down moves:
    * is the sign sequence random, or trending/oscillating? Too FEW
    * runs says trend (momentum), too many says oscillation — the
    * randomness companion to the Theil-Sen slope (which sizes a
    * trend but can't certify one). Zero deltas drop (the standard
    * treatment); n_up / n_down / n_runs are exact integers off two
    * lag windows sharing one partition sort, and z is one closing
    * expression ([[RunsZExpr]], token-shared with the oracle) —
    * NULL when either sign is absent or the variance degenerates.
    *
    * Scale shape: callers pass the pre-aggregated series (one row
    * per period); both lags ride a single exchange partitioned by
    * group over that calendar-bounded frame.
    *
    * @return (g, n_up, n_down, n_runs, z)
    */
  def runsTest(
      series: DataFrame,
      gCol: Column,
      tCol: Column,
      yCol: Column): DataFrame = {
    val byT = Window.partitionBy(col("g")).orderBy(col("t"))
    series.select(gCol.as("g"), tCol.as("t"), yCol.as("y"))
      .withColumn("prev", lag(col("y"), 1).over(byT))
      .filter(col("prev").isNotNull && col("y") =!= col("prev"))
      .withColumn("s", when(col("y") > col("prev"), 1L).otherwise(-1L))
      .withColumn("ps", lag(col("s"), 1).over(byT))
      .groupBy(col("g"))
      .agg(
        sum(when(col("s") === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("s") === -1L, 1L).otherwise(0L)).as("n_down"),
        sum(when(col("ps").isNull || col("s") =!= col("ps"), 1L)
          .otherwise(0L)).as("n_runs"))
      .select(col("g"), col("n_up"), col("n_down"), col("n_runs"),
        expr(RunsZExpr).as("z"))
  }

  /** Tie-corrected Mann-Kendall variance (n and tie_t exact ints). */
  val MkVarExpr: String =
    """(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)
        *(2.0*CAST(n AS DOUBLE) + 5.0) - CAST(tie_t AS DOUBLE))/18.0"""

  /** Continuity-corrected Mann-Kendall z off the exact S. */
  val MkZExpr: String =
    """CASE WHEN var_s <= 0.0 THEN NULL
       WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)/sqrt(var_s)
       WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)/sqrt(var_s)
       ELSE 0.0 END"""

  /** Mann-Kendall trend test per group: S = Σ_{i<j} sign(y_j − y_i)
    * over the time-ordered series with the tie-corrected variance —
    * the significance companion to the Theil-Sen slope (which sizes
    * the trend this test certifies; Kendall's tau machinery applied
    * against TIME). S folds entirely inside the collected
    * calendar-bounded series array (exact integer, O(len²) on ≤
    * days-per-group elements); the tie term Σ t(t−1)(2t+5) is one
    * hash agg over (group, value) cells; z is one closing expression
    * ([[MkVarExpr]]/[[MkZExpr]] token-shared with the oracle).
    *
    * Scale shape: callers pass the pre-aggregated series; the only
    * exchanges are two hash aggs to per-group rows plus a broadcast
    * join between them. Series longer than a few thousand points
    * should bin first (S's in-array fold is quadratic).
    *
    * @return (g, n, s_stat, var_s, z)
    */
  def mannKendall(
      series: DataFrame,
      gCol: Column,
      tCol: Column,
      yCol: Column): DataFrame = {
    val base = series.select(gCol.as("g"), tCol.as("t"), yCol.as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        expr("transform(sort_array(collect_list(struct(t, y))), x -> x.y)")
          .as("ys"))
      .select(col("g"), col("n"),
        expr("""CASE WHEN n < 2 THEN CAST(0 AS BIGINT)
            ELSE aggregate(sequence(2, CAST(n AS INT)),
              CAST(0 AS BIGINT), (acc, j) ->
                acc + size(filter(slice(ys, 1, j - 1),
                        v -> v < element_at(ys, j)))
                    - size(filter(slice(ys, 1, j - 1),
                        v -> v > element_at(ys, j))))
            END""").as("s_stat"))
    val ties = base.groupBy(col("g"), col("y"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(sum(col("c") * (col("c") - 1) * (col("c") * 2 + 5))
        .as("tie_t"))
    s.join(broadcast(ties), Seq("g"))
      .select(col("g"), col("n"), col("s_stat"),
        expr(MkVarExpr).as("var_s"))
      .select(col("g"), col("n"), col("s_stat"), col("var_s"),
        expr(MkZExpr).as("z"))
  }

  /** Per-pair Welch t over the renamed per-group stats row. */
  val PwTExpr: String =
    """CASE WHEN na <= 1 OR nb <= 1 THEN NULL
       ELSE (sa/na - sb/nb)
            / sqrt((qa - sa*sa/na)/(na - 1)/na
                   + (qb - sb*sb/nb)/(nb - 1)/nb)
       END"""

  /** Pairwise Welch contrasts across ALL group pairs — the follow-up
    * a significant [[anovaF]] demands ("some group differs" → which
    * ones): per ordered pair, both means and the unequal-variance t.
    * ONE pass folds the exact per-group sufficient statistics; the
    * pair grid is a broadcast self-join of that k-row frame (the
    * [[kendallTauB]] cell-pair shape — quadratic in GROUPS, never in
    * rows), and every double assembles from the same exact integers
    * on both engines ([[PwTExpr]]).
    *
    * @return (g_a, g_b, n_a, n_b, mean_a, mean_b, t_stat), g_a < g_b
    */
  def pairwiseWelch(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column): DataFrame = {
    val g = df.select(col(groupCol).as("g"), valueExpr.as("z"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("z").cast("decimal(38,0)")).cast("double").as("s"),
        sum((col("z") * col("z")).cast("decimal(38,0)")).cast("double")
          .as("q"))
    g.as("a").join(broadcast(g.as("b")), col("a.g") < col("b.g"))
      .select(col("a.g").as("g_a"), col("b.g").as("g_b"),
        col("a.n").as("na"), col("b.n").as("nb"),
        col("a.s").as("sa"), col("b.s").as("sb"),
        col("a.q").as("qa"), col("b.q").as("qb"))
      .select(col("g_a"), col("g_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        expr("sa/na").as("mean_a"), expr("sb/nb").as("mean_b"),
        expr(PwTExpr).as("t_stat"))
  }

  /** Hodges-Lehmann location estimator per group: the median of all
    * pairwise Walsh averages (xᵢ+xⱼ)/2, i ≤ j — the point estimate
    * the Wilcoxon/Mann-Whitney family inverts to, ~95% as efficient
    * as the mean at the normal yet 29%-breakdown robust (the mean
    * has 0%, the median pays more efficiency).
    *
    * Exactness: pairs materialize over the DISTINCT-value cell frame
    * (weights c_i·c_j off-diagonal, c(c+1)/2 on it — all exact
    * longs), doubled sums keep the half-integer averages integral,
    * and the weighted median is an exact rank read on
    * [[Quantiles.cumDist]] with the pair weights. Work is
    * O(distinct²) per group — built for bounded-cardinality
    * measures (quantities, counts, cents after binning); the input
    * rows themselves fold once.
    *
    * The cardinality contract is ENFORCED, not assumed: a group whose
    * distinct-value count exceeds `maxDistinctPerGroup` fails the job
    * at the executors (raise_error before the quadratic self-join can
    * form) instead of quietly going O(distinct²) at 100× the data.
    * Callers with high-NDV measures opt into `binCount` > 0: values
    * are first snapped down to at most `binCount` equi-width bins per
    * group (integer arithmetic — bin width w = (max−min) div binCount
    * + 1, representative v′ = min + ((v−min) div w)·w, identical in
    * any engine), an explicit, reproducible approximation of the
    * estimator's location.
    *
    * @return (g, n_pairs, hl_estimate)
    */
  def hodgesLehmann(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column,
      maxDistinctPerGroup: Long = 100000L,
      binCount: Int = 0): DataFrame = {
    val raw = df.select(col(groupCol).as("g"), valueExpr.as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val binned =
      if (binCount <= 0) raw
      else {
        val wsp = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
        raw
          .withColumn("vmin", min("v").over(wsp))
          .withColumn("vmax", max("v").over(wsp))
          .withColumn("bw", expr(s"(vmax - vmin) div $binCount") + lit(1L))
          .select(col("g"),
            (col("vmin") + expr("(v - vmin) div bw") * col("bw")).as("v"),
            col("c"))
          .groupBy("g", "v").agg(sum("c").as("c"))
      }
    val cells = binned
      .withColumn("ndv", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      // the guard rides the value column itself so column pruning can
      // never drop it; raise_error surfaces group and cardinality
      .withColumn("v",
        when(col("ndv") <= maxDistinctPerGroup, col("v"))
          .otherwise(raise_error(concat(
            lit("hodgesLehmann: group "), col("g").cast("string"),
            lit(" has "), col("ndv").cast("string"),
            lit(s" distinct values (max $maxDistinctPerGroup); " +
              "pass binCount to pre-bin")))))
      .drop("ndv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cells.as("a")
      .join(cells.as("b"),
        col("a.g") === col("b.g") && col("a.v") <= col("b.v"))
      .select(col("a.g").as("g"), (col("a.v") + col("b.v")).as("w2"),
        when(col("a.v") === col("b.v"),
          expr("a.c * (a.c + 1) div 2"))
          .otherwise(col("a.c") * col("b.c")).as("wt"))
    Quantiles.cumDist(pairs, col("g"), col("w2"), col("wt"))
      .groupBy(col("g"), col("n").as("n_pairs"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("v"))).as("w2med"))
      .select(col("g"), col("n_pairs"),
        (col("w2med").cast("double") / 2.0).as("hl_estimate"))
  }

  /** Kruskal-Wallis rank test across k groups of an integer-safe
    * measure — the nonparametric one-way ANOVA ([[anovaF]] on ranks):
    * does ANY group's distribution sit higher than the others?
    *
    * Pooled tie-averaged ranks stay exact as doubled integers
    * (2·rank = 2·cum − cnt + 1) read off [[Quantiles.cumDist]] over
    * the distinct-value frame; per-group doubled rank sums and the
    * tie term Σ_v cnt³−cnt (folded per cell as Σ c·(cnt²−1), no
    * second distinct pass) ride ONE hash aggregation over the
    * cell×rank join. The closing H assembles from the k-row group
    * frame sorted by key ([[KwTerm]]/[[KwHExpr]] token-shared with
    * the oracle).
    *
    * Scale shape: input rows fold to (group, value) cells first; the
    * rank frame is one row per distinct value. DECIMAL operands:
    * cell counts 12 digits, doubled ranks 14 — products ≤ 38 in both
    * engines to ~1e12 rows.
    *
    * @return 1 row: (k, n, tie_t, q4, h_stat)
    */
  def kruskalWallis(
      df: DataFrame,
      groupCol: String,
      valueExpr: Column): DataFrame = {
    val cells = df.select(col(groupCol).as("g"), valueExpr.as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranks = Quantiles
      .cumDist(cells, lit(0), col("v"), col("c"))
      .select(col("v"), col("cnt"),
        (col("cum") * 2L - col("cnt") + 1L).as("dr"))
    val gsum = cells.join(ranks, Seq("v"))
      .groupBy("g")
      .agg(sum(col("c")).as("n_g"),
        sum(col("c").cast("decimal(12,0)") * col("dr").cast("decimal(14,0)"))
          .cast("decimal(38,0)").as("r2"),
        sum(col("c").cast("decimal(12,0)") *
            (col("cnt").cast("decimal(12,0)") * col("cnt").cast("decimal(12,0)")
              - 1)).cast("decimal(38,0)").as("tt"))
    gsum
      .agg(count(lit(1)).as("k"), sum("n_g").as("n"),
        sum(col("tt")).cast("double").as("tie_t"),
        sort_array(collect_list(struct(col("g"), col("n_g"), col("r2"))))
          .as("gs"))
      .select(col("k"), col("n"), col("tie_t"),
        expr(s"""aggregate(gs, CAST(0 AS DOUBLE),
            (a, x) -> a + ($KwTerm))""").as("q4"))
      .select(col("k"), col("n"), col("tie_t"), col("q4"),
        expr(KwHExpr).as("h_stat"))
  }
}
