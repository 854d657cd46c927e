package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: gap filling onto a fixed-step bucket
  * spine plus forward fill — the step that turns an irregular event
  * log into the dense per-entity series that rate monitors, feature
  * windows, and training-curriculum schedulers consume. (The
  * reference's engine has no temporal axis beyond snapshot stamping;
  * this is part of the §7.4 extension surface.)
  *
  * Scale shape: the spine is GENERATED DISTRIBUTED — each entity's
  * per-bucket range rides out of its own aggregate row via
  * `sequence(...)` + `explode`, so there is no driver-side calendar
  * loop and no cross join against a global calendar table (a global
  * calendar × entities cross join would shuffle |entities|·|buckets|
  * rows even for entities active one hour). Work is Σ per-entity
  * span, the output's own size. The pipeline is bucket-agg (one
  * shuffle on (entity, bucket)), per-entity bounds (clusters on
  * entity), spine join back (left join on (entity, bucket)), then
  * the forward-fill window partitioned by entity — per-entity series
  * sort within their partition, never a global sort.
  *
  * Determinism: bucket edges come from `date_trunc`, counts are
  * exact longs, the carried value is a per-bucket `max` (order-free),
  * and the fill reads `last(..., ignoreNulls)` over the unique
  * (entity, bucket) ordering — bit-stable under any partitioning.
  */
object Timeseries {

  /** Dense hourly series per entity: one row per hour between the
    * entity's first and last event (inclusive), `n_events` = 0 on
    * gap hours, `v_ffill` = the most recent non-null hourly
    * `max(valueCol)` at or before that hour (null until the entity's
    * first non-null value).
    *
    * @return (entity, hour TIMESTAMP, n_events BIGINT, v_ffill DOUBLE)
    */
  def gapFillHourly(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .select(
        col(entityCol).as("entity"),
        date_trunc("hour", col(tsCol)).as("hour"),
        col(valueCol).cast("double").as("v"))
      .groupBy(col("entity"), col("hour"))
      .agg(count(lit(1)).as("n_events"), max(col("v")).as("vmax"))
    val bounds = hourly
      .groupBy(col("entity"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = bounds.select(
      col("entity"),
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val joined = spine.join(hourly, Seq("entity", "hour"), "left")
    val w = Window.partitionBy(col("entity")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.select(
      col("entity"),
      col("hour"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      last(col("vmax"), ignoreNulls = true).over(w).as("v_ffill"))
  }
}
