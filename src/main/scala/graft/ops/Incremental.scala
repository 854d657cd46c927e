package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates: keep a
  * per-key (count, exact sum) partial table and fold each new batch
  * into it WITHOUT rescanning history — the continuous-ingest shape
  * (the reference reloads full snapshots; at 100 TB the history scan
  * is the cost, and distributive aggregates don't need it).
  *
  * The invariant that makes it safe: merge(partials(A), partials(B))
  * ≡ partials(A ∪ B) for count and decimal-exact sums — the same
  * mergeability discipline as the KMV/CMS sketch state, here for the
  * exact aggregates. The oracle proves it by recomputing from the
  * full union.
  *
  * Scale shape: the batch aggregates first (one shuffle over the
  * BATCH only), then merges with the stored partials by key — work
  * per refresh is O(batch + |touched keys|), never O(history).
  * Derived measures (avg) are projections over the partials.
  */
object Incremental {

  /** Per-key partials of one slice: (key, n BIGINT, sum_cents BIGINT). */
  def partials(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum((col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"))

  /** Fold a new batch's partials into the stored ones. Keys appearing
    * in only one side pass through; shared keys add exactly.
    */
  def merge(stored: DataFrame, batch: DataFrame, keyCol: String): DataFrame =
    stored.select(col(keyCol), col("n"), col("sum_cents"))
      .unionAll(batch.select(col(keyCol), col("n"), col("sum_cents")))
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))

  /** Derived measures from the maintained partials (exact mean from
    * exact sums — one closing double division).
    */
  def withMean(partials: DataFrame): DataFrame =
    partials.withColumn("mean_value",
      col("sum_cents").cast("double") / col("n").cast("double") / lit(100.0))
}
