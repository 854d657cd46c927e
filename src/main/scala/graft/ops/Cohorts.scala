package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weekly cohort-retention matrix over an event log: users are
  * cohorted by the Monday of the week of their first event, and the
  * cell (cohort_week, week_offset) counts the distinct users of that
  * cohort active during cohort_week + offset weeks.
  *
  * Scale shape: the cohort assignment is a window min over the user
  * partition — the same single exchange the per-user frame already
  * needs, NOT a groupBy + self-join back onto the log (which would
  * shuffle the log twice at 100 TB). The distinct-user count then
  * reduces (cohort, offset, user) with map-side partial distinct
  * before the final count — Spark plans count(DISTINCT) as the
  * two-phase expand/agg automatically.
  *
  * Determinism: `date_trunc('week', …)` is Monday-based in both Spark
  * and DuckDB; offsets are exact integer day arithmetic on DATE;
  * weeks are emitted as formatted strings.
  */
object Cohorts {

  /** @return rows (cohort_week STRING 'yyyy-MM-dd', week_offset BIGINT,
    *         n_active BIGINT).
    */
  def weeklyRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(
        col(userCol).as("user_id"),
        to_date(date_trunc("week", col(tsCol))).as("event_week"))
      .withColumn("cohort_week", min(col("event_week")).over(w))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("event_week"), col("cohort_week")) / lit(7))
          .cast("long").as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
  }

  /** RFM segmentation: per-entity Recency / Frequency / Monetary
    * quintile scores against a fixed reporting anchor — the classic
    * customer-value readout, built scale-safe. Each measure's
    * quintile comes from an exact rank read on [[Quantiles.cumDist]]
    * over the measure's DISTINCT-value frame (`⌈5·cum/n⌉` via
    * positive integer `div` — never a global NTILE sort, whose
    * parallelism is 1). Recency is inverted (`6 − q`) so 5 always
    * means "best": most recent, most frequent, highest spend.
    *
    * Scale shape: one hash aggregation to the per-entity frame
    * (persisted — it feeds three cumDist passes and the final
    * lookups), three distinct-value cumDist pipelines (each orders of
    * magnitude below the entity count), three equi-joins back. The
    * anchor is a caller-supplied literal date, not a data-derived
    * 1-row broadcast: reporting runs pin their as-of date anyway, and
    * it keeps the plan join-free of scalar crosses.
    *
    * @param anchorDate 'yyyy-MM-dd' as-of date (recency = days from
    *                   last activity to the anchor)
    * @return (user_id, rec_days, freq, mon_cents,
    *         r_score, f_score, m_score, segment)
    */
  def rfm(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      centsExpr: org.apache.spark.sql.Column,
      anchorDate: String): DataFrame = {
    val per = events
      .groupBy(col(userCol).as("user_id"))
      .agg(
        datediff(lit(anchorDate).cast("date"), max(to_date(col(tsCol))))
          .cast("long").as("rec_days"),
        count(lit(1)).as("freq"),
        sum(centsExpr.cast("long")).as("mon_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // quintile read off the distinct-value CDF: ⌈5·cum/n⌉ ∈ 1..5
    def quint(c: String): DataFrame =
      Quantiles.cumDist(per, lit(0), col(c))
        .select(col("v").as(c),
          expr("(5*cum + n - 1) div n").as(s"q_$c"))

    per
      .join(quint("rec_days"), Seq("rec_days"))
      .join(quint("freq"), Seq("freq"))
      .join(quint("mon_cents"), Seq("mon_cents"))
      .select(col("user_id"), col("rec_days"), col("freq"),
        col("mon_cents"),
        (lit(6L) - col("q_rec_days")).as("r_score"),
        col("q_freq").as("f_score"),
        col("q_mon_cents").as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"),
          col("f_score").cast("string"),
          col("m_score").cast("string")))
  }

  /** Daily-activity streaks: per user, total active days and the
    * longest run of CONSECUTIVE calendar days with activity — the
    * retention/habit readout (gaps-and-islands over points with a
    * 1-day gap; [[graft.ops.Intervals.mergeIntervals]] is the span
    * generalization). Ties on length resolve to the LATEST streak
    * start via one struct-max — deterministic, no second window.
    *
    * Scale shape: the log reduces to distinct (user, day) first
    * (map-side partial distinct), then one window pass partitioned by
    * user over that calendar-bounded frame, then two hash aggs.
    *
    * @return (user_id, n_active_days, longest_streak, streak_start)
    */
  def activityStreaks(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val order = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val upto = order.rowsBetween(Window.unboundedPreceding, 0)
    days
      .withColumn("prev", lag(col("day"), 1).over(order))
      .withColumn("brk",
        when(col("prev").isNull ||
          datediff(col("day"), col("prev")) > 1, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(upto))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("d"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        max(struct(col("len"), col("d"))).as("m"))
      .select(col("user_id"), col("n_active_days"),
        col("m.len").as("longest_streak"),
        col("m.d").cast("string").as("streak_start"))
  }

  /** Shared Spark↔oracle closing expression for [[smoothedRates]]:
    * additive (empirical-Bayes-style) shrinkage toward the global
    * rate with prior strength m — `(s + m·S/N) / (n + m)`.
    */
  def SmoothExpr(m: Int): String =
    s"""(CAST(s AS DOUBLE)
        + $m.0*(CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)))
       / (CAST(n AS DOUBLE) + $m.0)"""

  /** Per-entity success rates shrunk toward the global rate: the
    * low-volume-entity fix for rate rankings (a 1/1 user must not
    * outrank a 95/100 one). `smoothed = (s_i + m·p̄)/(n_i + m)` with
    * p̄ the GLOBAL success rate and m the prior's pseudo-count
    * weight. All sufficient statistics are exact integers; the two
    * closing divisions are one token-shared expression.
    *
    * Scale shape: one conditional-count hash aggregation to the
    * per-entity frame; the global totals re-aggregate THAT frame
    * (never a second input scan) into one row, broadcast back as the
    * documented tiny-cross pattern.
    *
    * @return (user_id, n, s, smoothed_rate)
    */
  def smoothedRates(
      events: DataFrame,
      userCol: String,
      successExpr: org.apache.spark.sql.Column,
      priorWeight: Int = 20): DataFrame = {
    val per = events
      .groupBy(col(userCol).as("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(successExpr, 1L).otherwise(0L)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = per.agg(sum(col("n")).as("ng"), sum(col("s")).as("sg"))
    per.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n"), col("s"),
        expr(SmoothExpr(priorWeight)).as("smoothed_rate"))
  }
}
