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

  /** Salted equi-join for a zipfian-keyed fact table: fact rows
    * scatter over `saltBuckets` sub-keys, the (small) dimension side
    * is replicated once per salt, and the join runs on
    * (key, salt) — the hot key's rows land on `saltBuckets` tasks
    * instead of one. Each fact row matches exactly one replica, so
    * the RESULT is identical to the plain inner join for any salt
    * assignment (which is why the nondeterministic id-based scatter
    * is safe — it only moves rows, never changes matches).
    *
    * Costs dimension×saltBuckets shuffle volume; use when one key is
    * hot enough that AQE's skew split (which needs sort-merge and
    * post-shuffle stats) can't save the stage.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltBuckets: Int = 16): DataFrame = {
    val f = fact.withColumn("__fsalt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val d = dim.withColumn("__dsalt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    f.join(d, f(factKey) === d(dimKey) && f("__fsalt") === d("__dsalt"))
      .drop("__fsalt").drop("__dsalt")
  }

  /** Two-phase salted sum/count aggregation with DECIMAL-exact sums:
    * equivalent to `sum(CAST(value AS DECIMAL(28,6)))` + `count(*)`
    * per key (values with more than 6 decimal places are rounded by
    * that cast — the decimal route is what makes the result
    * independent of partitioning/salting, which a double sum is not).
    *
    * The default salt spreads rows round-robin-style via
    * `monotonically_increasing_id`. Salt values only affect row
    * DISTRIBUTION, never the re-aggregated result (the aggregate is
    * algebraic), so the id's nondeterminism under task retries is
    * harmless — while hashing the value column would collapse to a
    * single bucket exactly in the constant-value hot-key case this
    * helper exists for.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltBuckets: Int = 16,
      saltExpr: Option[Column] = None): DataFrame = {
    val salt = saltExpr.getOrElse(
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    df.withColumn("__salt", salt)
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(col(valueCol).cast("decimal(28,6)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
