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
}
