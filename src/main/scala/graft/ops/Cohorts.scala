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
      anchorDate: String): DataFrame =
    rfmFromPartials(rfmPartials(events, userCol, tsCol, centsExpr), anchorDate)

  /** Per-user RFM sufficient statistics — all three are order-free
    * folds (max date, count, integer sum), which is what makes the
    * incremental snapshot twin exact: folding per-batch partials with
    * [[rfmFold]] then closing with [[rfmFromPartials]] is BIT-EQUAL
    * to the batch operator over the union of batches.
    */
  def rfmPartials(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      centsExpr: org.apache.spark.sql.Column): DataFrame =
    events
      .groupBy(col(userCol).as("user_id"))
      .agg(
        max(to_date(col(tsCol))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(centsExpr.cast("long")).as("mon_cents"))

  /** Fold one micro-batch into stored (user_id, last_day, freq,
    * mon_cents) partials — the
    * [[graft.streaming.EventStreams.smoothedRatesFold]] shape.
    */
  def rfmFold(
      stored: DataFrame,
      batch: DataFrame,
      userCol: String,
      tsCol: String,
      centsExpr: org.apache.spark.sql.Column): DataFrame =
    stored.unionAll(rfmPartials(batch, userCol, tsCol, centsExpr))
      .groupBy("user_id")
      .agg(max("last_day").as("last_day"), sum("freq").as("freq"),
        sum("mon_cents").as("mon_cents"))

  /** Close the RFM read over per-user partials (the anchor converts
    * last_day → recency at READ time, so one partials store serves
    * any reporting date).
    */
  def rfmFromPartials(partials: DataFrame, anchorDate: String): DataFrame = {
    val per = partials
      .select(col("user_id"),
        datediff(lit(anchorDate).cast("date"), col("last_day"))
          .cast("long").as("rec_days"),
        col("freq"), col("mon_cents"))
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

  /** Cohort LTV curve: cumulative revenue per signup-week cohort by
    * weeks since signup — [[weeklyRetention]]'s money twin, the
    * payback readout ("when does a cohort's cumulative spend cross
    * its acquisition cost"). Revenue is exact integer cents; the
    * cumulative sum rides the (cohort × offset) frame, bounded by
    * calendar weeks squared, never data-sized.
    *
    * Scale shape: cohort assignment is the same single user-partition
    * window the per-user frame needs anyway; the base projection is
    * persisted because the weekly-revenue and cohort-size aggregates
    * both consume it.
    *
    * @return (cohort_week, week_offset, n_users, wk_cents, cum_cents)
    */
  def ltvCurve(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      centsExpr: org.apache.spark.sql.Column,
      revenueWhen: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val base = events
      .select(
        col(userCol).as("user_id"),
        to_date(date_trunc("week", col(tsCol))).as("event_week"),
        when(revenueWhen, centsExpr.cast("long")).otherwise(0L).as("cents"))
      .withColumn("cohort_week", min(col("event_week")).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val weekly = base
      .groupBy(col("cohort_week"),
        (datediff(col("event_week"), col("cohort_week")) / lit(7))
          .cast("long").as("week_offset"))
      .agg(sum(col("cents")).as("wk_cents"))
    val sizes = base.groupBy(col("cohort_week"))
      .agg(count_distinct(col("user_id")).as("n_users"))
    weekly.join(sizes, Seq("cohort_week"))
      .withColumn("cum_cents", sum(col("wk_cents")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"), col("wk_cents"),
        col("cum_cents"))
  }

  /** Shared Spark↔oracle closing expression for [[paretoShare]]. */
  val ParetoExpr: String =
    """CASE WHEN total_cents = 0 THEN NULL
       ELSE CAST(top_cents AS DOUBLE)/CAST(total_cents AS DOUBLE)
       END"""

  /** Revenue concentration: the share of total spend held by users
    * at or above the 90th-percentile per-user spend — the "do 10% of
    * users carry the corpus" scalar that [[graft.ops.StatTests
    * .giniByGroup]] generalizes to a full coefficient. The threshold
    * is an exact rank read on the global [[Quantiles.cumDist]] over
    * DISTINCT per-user totals (tie-inclusive: everyone AT the
    * threshold value counts as top), so the number is deterministic
    * under any partitioning.
    *
    * @return 1 row: (n_users, p90_cents, top_cents, total_cents,
    *         top_share)
    */
  def paretoShare(
      events: DataFrame,
      userCol: String,
      centsExpr: org.apache.spark.sql.Column): DataFrame = {
    val per = events
      .groupBy(col(userCol).as("user_id"))
      .agg(sum(centsExpr.cast("long")).as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = Quantiles.cumDist(per, lit(0), col("cents"))
      .agg(min(when(col("cum") * 10L >= col("n") * 9L, col("v")))
        .as("p90_cents"))
    per.crossJoin(broadcast(thr))
      .agg(
        count(lit(1)).as("n_users"),
        max(col("p90_cents")).as("p90_cents"),
        sum(when(col("cents") >= col("p90_cents"), col("cents"))
          .otherwise(0L)).as("top_cents"),
        sum(col("cents")).as("total_cents"))
      .select(col("n_users"), col("p90_cents"), col("top_cents"),
        col("total_cents"), expr(ParetoExpr).as("top_share"))
  }

  /** New vs returning users per day: a user counts as new on their
    * first-ever active day, returning on any later active day. One
    * distinct (user, day) reduction, one user-partition window min,
    * one daily conditional-count aggregation.
    *
    * @return (day, n_new, n_returning)
    */
  def newVsReturning(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
      .withColumn("first_day", min(col("day")).over(w))
      .groupBy(col("day"))
      .agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
          .as("n_returning"))
      .select(col("day").cast("string").as("day"), col("n_new"),
        col("n_returning"))
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
