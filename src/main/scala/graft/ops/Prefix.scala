package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix scans over a global order — the pattern that
  * replaces the classic scale-killer `Window.orderBy(...)` with no
  * partition keys, which Spark executes as a SINGLE task holding the
  * whole dataset. Both operators here decompose the global scan the
  * same way: range-partition on the order key (so partition i's keys
  * all precede partition i+1's), compute the scan LOCALLY inside
  * each partition, then correct each partition by a prefix computed
  * over the tiny per-partition summary frame (one row per partition
  * — the only single-task window left, over ~#partitions rows).
  * Parallelism equals the partition count at any data size; nothing
  * driver-side except Spark's own range-boundary sampling.
  */
object Prefix {

  /** Dense global row numbers 1..N in `orderCol` order — distributed
    * zipWithIndex for DataFrames. `orderCol` must be unique (ties
    * would make the numbering nondeterministic, as in any engine's
    * row_number).
    *
    * Shape: one range exchange + one pid-clustered exchange (same
    * row volume, 1 long wider), a per-partition row_number, and a
    * prefix-sum over the #partitions-row count frame broadcast back.
    * Versus the naive `row_number() OVER (ORDER BY k)`: that plan is
    * a global sort INTO ONE TASK — at 100 TB it simply does not run.
    * The ranged frame is persisted ([[Dedup.minHashLshPairs]]'
    * one-scan discipline — exchange reuse is not guaranteed to dedupe
    * the rank and count consumers, and measured plans confirm it
    * doesn't here), so the input lineage and the range exchange run
    * once; the ContextCleaner frees the cached blocks once the frame
    * is unreferenced.
    *
    * @return input columns + `gid` BIGINT.
    */
  def globalRowNumbers(
      df: DataFrame,
      orderCol: String,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = ranged.withColumn("_lrn",
      row_number().over(
        Window.partitionBy(col("_pid")).orderBy(col(orderCol))).cast("long"))
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    val offsets = counts.select(
      col("_pid"),
      coalesce(
        sum(col("_cnt")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("_off"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("gid", col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }

  /** Global NTILE(n) without the single-task window: buckets derive
    * arithmetically from [[globalRowNumbers]] plus the total count
    * (a 1-row broadcast read off max(gid) — no second scan). The
    * formula is SQL ntile's exactly: the first N mod n buckets get
    * ⌈N/n⌉ rows, the rest ⌊N/n⌋ — verified bit-for-bit against a
    * native NTILE oracle. `orderCol` must be unique (ties make any
    * engine's ntile nondeterministic).
    *
    * @return input columns + `gid` BIGINT + `tile` BIGINT in [1, n].
    */
  def globalNtile(df: DataFrame, orderCol: String, n: Int): DataFrame = {
    require(n >= 1, "ntile bucket count must be positive")
    val withGid = globalRowNumbers(df, orderCol)
    val total = withGid.agg(max(col("gid")).as("_N"))
    withGid.crossJoin(broadcast(total))
      .withColumn("tile", expr(
        s"""CASE WHEN gid <= ((_N div $n) + 1) * (_N % $n)
              THEN (gid - 1) div ((_N div $n) + 1) + 1
              ELSE (_N % $n) +
                (gid - ((_N div $n) + 1) * (_N % $n) - 1)
                  div greatest(_N div $n, 1) + 1 END"""))
      .drop("_N")
  }

  /** Inclusive running total of `valueCol` over the global `orderCol`
    * order — the same range-partitioned decomposition as
    * [[globalRowNumbers]] with SUM in place of COUNT: local running
    * sum per partition plus broadcast per-partition prefix totals.
    * `orderCol` must be unique.
    *
    * The canonical consumer is BALANCED SHARDING: with `valueCol` =
    * bytes, `floor((cum − 1) / targetBytes)` assigns every row a
    * shard such that shards hold ≈ targetBytes each and shard
    * boundaries respect the global order — the deterministic
    * equal-size output layout a 100 TB corpus write needs (contrast
    * `repartition(n)`: nondeterministic placement, no size bound per
    * shard when row sizes vary).
    *
    * @return input columns + `cum` BIGINT (inclusive prefix sum).
    */
  def runningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val local = ranged.withColumn("_lcum",
      sum(col(valueCol)).over(
        Window.partitionBy(col("_pid")).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = ranged.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_tot"))
    val offsets = totals.select(
      col("_pid"),
      coalesce(
        sum(col("_tot")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("_off"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("cum", col("_off") + col("_lcum"))
      .drop("_pid", "_lcum", "_off")
  }

  /** 2-d skyline (Pareto frontier, maximizing both axes): the rows
    * not STRICTLY dominated — no other row has larger x AND larger y.
    * The multi-objective pruning filter (e.g. keep documents no
    * other document beats on both quality and freshness).
    *
    * Shape: the O(n²) NOT-EXISTS formulation is collapsed to one
    * prefix-max — a row survives iff max(y) over strictly-greater x
    * doesn't exceed its own y. Per-x max is an ordinary hash agg;
    * the strict prefix-max over distinct x runs range-partitioned
    * exactly like [[globalRowNumbers]] (local running max excluding
    * the current row, plus the max over all PRECEDING partitions from
    * the per-partition summary); the verdict broadcasts back to the
    * original rows on x. No self-join, no nested loop, no global
    * single-task sort.
    *
    * @return input columns, skyline rows only.
    */
  def skylineMax2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val perX = df.groupBy(col(xCol).as("_x"))
      .agg(max(col(yCol)).as("_my"))
    val ranged = perX.repartitionByRange(n, col("_x").desc)
      .withColumn("_pid", spark_partition_id())
    // strictly-before running max inside the partition (null on the
    // partition's first row); distinct _x rows make "before" = "x
    // strictly greater"
    val localMax = max(col("_my")).over(
      Window.partitionBy(col("_pid")).orderBy(col("_x").desc)
        .rowsBetween(Window.unboundedPreceding, -1))
    // max over all preceding PARTITIONS, from the one-row-per-
    // partition summary (the only single-task window, ~#partitions
    // rows)
    val partMax = ranged.groupBy(col("_pid")).agg(max(col("_my")).as("_pm"))
    val prefixes = partMax.select(
      col("_pid"),
      max(col("_pm")).over(
        Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)).as("_prev"))
    // greatest() skips nulls: null only when BOTH sides are null,
    // i.e. nothing precedes this x anywhere — the global max row(s)
    val dominators = ranged.join(broadcast(prefixes), Seq("_pid"))
      .select(col("_x"), greatest(localMax, col("_prev")).as("_dm"))
    df.join(dominators, df(xCol) === dominators("_x"))
      .filter(col("_dm").isNull || col("_dm") <= col(yCol))
      .drop("_x", "_dm")
  }
}
