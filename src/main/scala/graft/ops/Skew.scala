package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregations and joins.
  *
  * AQE's skew-join split handles most runtime skew; these helpers
  * cover the cases AQE can't: a single aggregation key so hot that
  * one task owns it (the classic zipfian word-count / hot-document
  * problem at 100 TB).
  *
  * `saltedAggregate` is the standard two-phase trick: shuffle once on
  * (key, salt) so the hot key spreads over `saltBuckets` tasks, then
  * re-aggregate the (small) per-salt partials on the key alone. Works
  * for any algebraic aggregate (sum/count/min/max here).
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * Equivalent to `df.groupBy(key).agg(sum(value), count(*))` but
    * immune to single-key skew. The salt is deterministic
    * (`pmod(hash(row-cols), buckets)` would be nondeterministic under
    * retries for nondeterministic inputs, so we use a stable row
    * expression supplied by the caller — default: spark_partition_id
    * is NOT used for exactly that reason).
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltBuckets: Int = 16,
      saltExpr: Option[Column] = None): DataFrame = {
    val salt = saltExpr.getOrElse(pmod(xxhash64(col(valueCol)), lit(saltBuckets)))
    df.withColumn("__salt", salt)
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
