package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: gap-based session assembly over an event log
  * — the batch twin of `graft.streaming.EventStreams.sessionize`
  * (which builds the same sessions incrementally under a watermark
  * with flatMapGroupsWithState). A session breaks when the gap to the
  * user's previous event exceeds `gapSeconds`.
  *
  * Scale shape: ONE shuffle on the user key; the lag pass, the
  * running new-session sum, and the final per-session aggregation all
  * cluster on user_id, so Catalyst reuses the single exchange (the
  * group-by keys are a superset of the partitioning). Per-user event
  * streams sort within their partition — the classic distributed
  * sessionization plan.
  *
  * Determinism: events order by the unique (ts, event_id) pair; gap
  * tests and durations are integer microsecond arithmetic; session
  * bounds are emitted as formatted strings per the oracle recipe.
  */
object Sessions {

  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0L, "session gap must be positive")
    val gapUs = gapSeconds * 1000000L
    val base = events.select(
      col(userCol).as("user_id"),
      col(idCol).as("event_id"),
      col(tsCol).as("ts"),
      unix_micros(col(tsCol)).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        (col("prev_us").isNull || col("us") - col("prev_us") > gapUs).cast("long"))
      .withColumn("session_seq", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        // the id of the session-OPENING event (temporally first, same
        // unique (ts, id) order the session split used) — not min(id),
        // which diverges when ids aren't assigned in timestamp order
        min_by(col("event_id"), struct(col("us"), col("event_id")))
          .as("first_event_id"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        floor((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long")
          .as("duration_sec"))
  }
}
