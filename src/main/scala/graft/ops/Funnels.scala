package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: for a step sequence
  * (s₁, s₂, …, s_K), count the users who completed each prefix in
  * order — an s₂ event counts only if a qualified s₁ event strictly
  * precedes it, an s₃ event only if a qualified s₂ event strictly
  * precedes it, and every post-anchor step must land within
  * `horizonSeconds` of the user's first s₁ event (the classic
  * conversion window).
  *
  * Implementation: a cascade of running-min window layers over ONE
  * window spec — partition by user, order by the unique (ts, event_id)
  * pair, frame ROWS [unbounded, -1] so "strictly precedes" is exact
  * even under timestamp ties. Window functions can't nest, so each
  * step adds a Project+Window layer, but every layer reuses the same
  * partitioning and sort: one exchange and one sort total, regardless
  * of K. The per-user rollup groups on the partitioning key (exchange
  * reused again) and the final K-row unpivot is a one-row `stack`. No
  * self-joins and no per-step passes over the log — that is what
  * survives a 100-TB event table.
  *
  * Determinism: integer-µs arithmetic for the horizon test; counts
  * are exact longs; `pct_of_first` is a single double division per
  * output row.
  */
object Funnels {

  /** Per-user earliest completion time of each step prefix:
    * (user_id, m1..mK) with m_i = earliest qualifying step-i event
    * time in µs, null if never reached. The shared core of the
    * aggregate [[funnel]] and the per-user [[userSteps]].
    */
  private def perUserReach(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      steps: Seq[String],
      horizonSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(horizonSeconds > 0L, "conversion horizon must be positive")
    val horizonUs = horizonSeconds * 1000000L
    val k = steps.size

    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, -1)

    var cur = events
      .select(
        col(userCol).as("user_id"),
        col(typeCol).as("etype"),
        unix_micros(col(tsCol)).as("us"),
        col(idCol).as("eid"))
      .withColumn("q1", when(col("etype") === lit(steps.head), col("us")))
    // r1 doubles as the conversion-window anchor: once a user's first
    // s1 is in the past, the running min IS that first-s1 time.
    for (i <- 2 to k) {
      cur = cur
        .withColumn(s"r${i - 1}", min(col(s"q${i - 1}")).over(w))
        .withColumn(s"q$i",
          when(
            col("etype") === lit(steps(i - 1)) && col(s"r${i - 1}").isNotNull &&
              col("us") - col("r1") <= lit(horizonUs),
            col("us")))
    }

    cur
      .groupBy(col("user_id"))
      .agg(
        min(col("q1")).as("m1"),
        (2 to k).map(i => min(col(s"q$i")).as(s"m$i")): _*)
  }

  /** Per-user step-completion rows (user_id, step BIGINT, step_name,
    * reached_us BIGINT) — one row per step a user actually reached;
    * the batch twin of the streaming funnel's transition feed.
    */
  def userSteps(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      steps: Seq[String],
      horizonSeconds: Long = 7L * 24 * 3600): DataFrame = {
    val per = perUserReach(events, userCol, tsCol, idCol, typeCol, steps, horizonSeconds)
    val stackArgs = steps.indices
      .map(i => s"${i + 1}L, '${steps(i)}', m${i + 1}")
      .mkString(", ")
    per
      .select(col("user_id"),
        expr(s"stack(${steps.size}, $stackArgs) AS (step, step_name, reached_us)"))
      .filter(col("reached_us").isNotNull)
  }

  /** @return K rows: (step BIGINT 1-based, step_name, n_users BIGINT,
    *         pct_of_first DOUBLE).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      steps: Seq[String],
      horizonSeconds: Long = 7L * 24 * 3600): DataFrame = {
    val k = steps.size
    val totals = perUserReach(
      events, userCol, tsCol, idCol, typeCol, steps, horizonSeconds)
      .agg(
        sum(col("m1").isNotNull.cast("long")).as("n1"),
        (2 to k).map(i => sum(col(s"m$i").isNotNull.cast("long")).as(s"n$i")): _*)

    val stackArgs = steps.indices
      .map(i => s"${i + 1}L, '${steps(i)}', n${i + 1}")
      .mkString(", ")
    totals
      .select(expr(s"stack($k, $stackArgs) AS (step, step_name, n_users)"), col("n1"))
      .select(
        col("step"),
        col("step_name"),
        col("n_users"),
        (col("n_users").cast("double") / col("n1").cast("double")).as("pct_of_first"))
  }
}
