package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing ("gaps and islands" over SPANS): merge
  * overlapping or touching [start, end) intervals per key into
  * maximal islands. The general form of sessionization — with
  * VARIABLE-length intervals an earlier span can swallow several
  * later ones, so the island boundary test needs the running maximum
  * of prior ends, not the previous row's end (the fixed-gap special
  * case [[Sessions]] handles). The workhorse behind availability
  * windows, outage merging, media-clip consolidation, and span-level
  * dedup scrub ranges (cf. [[SubstrDedup]]'s span merge, which this
  * generalizes to arbitrary keyed interval inputs).
  *
  * Algorithm (one window sort per key):
  * {{{
  *   pmax  = max(end) over key rows BEFORE this one (by start)
  *   new?  = start > pmax  (or first row)
  *   isl   = running count of new? flags   // island id
  *   → groupBy(key, isl): min(start), max(end), count
  * }}}
  *
  * Determinism: window order is (start, tiebreak) with an explicit
  * unique tiebreak column, so tied starts produce identical islands
  * in any engine (a tie can never OPEN an island behind an equal
  * start: equal start ⇒ start ≤ prior end candidate only matters
  * through pmax, which is order-free as a running max over ALL
  * preceding rows once ties are fully ordered).
  *
  * Scale shape: both windows share one (key) partitioning and one
  * (start, tiebreak) sort — Catalyst plans a single exchange + sort;
  * parallelism = distinct keys, the natural unit (a key's intervals
  * must serialize to merge). The closing aggregation is hash-based,
  * partial-combining.
  */
object Intervals {

  /** Merge overlapping/touching [start, end) intervals per key.
    *
    * @param keyExpr   partition key (e.g. user, host, asset)
    * @param startExpr interval start — integer-safe (epoch seconds)
    * @param endExpr   interval end, same unit; rows with
    *                  end < start are kept as zero-length points
    * @param tieExpr   unique per-row tiebreak for deterministic order
    * @return (k, island, start, end, n_merged) — one row per island
    */
  def mergeIntervals(
      df: DataFrame,
      keyExpr: Column,
      startExpr: Column,
      endExpr: Column,
      tieExpr: Column): DataFrame = {
    val base = df.select(keyExpr.as("k"), startExpr.as("s"),
      endExpr.as("e"), tieExpr.as("rid"))
    val prior = Window.partitionBy(col("k"))
      .orderBy(col("s"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy(col("k"))
      .orderBy(col("s"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("pmax", max(col("e")).over(prior))
      .withColumn("opens",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(upto))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("start"), max(col("e")).as("end"),
        count(lit(1)).as("n_merged"))
  }
}
