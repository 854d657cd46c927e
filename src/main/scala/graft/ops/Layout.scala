package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpression

/** Multi-dimensional data layout: z-order clustering for write-side
  * file skipping.
  *
  * A parquet table sorted on one column skips files only for
  * predicates on that column; every other dimension's min/max spans
  * the whole domain in every file. Clustering by the Morton
  * interleave of two dimension keys bounds BOTH dimensions per file:
  * a (x-range AND y-range) box predicate prunes on file statistics
  * in both axes, and single-axis predicates still prune (each file's
  * z-range confines each axis to a fraction of its domain).
  *
  * At 100 TB this is a write-amplification-free layout choice — the
  * cluster step is one range-repartition + within-partition sort (the
  * same cost any sorted write pays), the key is a branch-free
  * codegen'd expression, and downstream file skipping is ordinary
  * parquet min/max pruning, no index structure to maintain.
  */
object Layout {

  /** The 62-bit Morton key of two pre-scaled [0, 2^31) dimensions. */
  def zKey(x: Column, y: Column): Column =
    ZOrderExpression.zOrderKey(x.cast("long"), y.cast("long"))

  /** The 32-bit Hilbert key of two pre-scaled [0, 2^16) dimensions —
    * strictly better locality than [[zKey]] (consecutive keys are
    * always ADJACENT cells; the z-curve jumps at every power-of-two
    * boundary), so the same file count yields tighter per-file
    * (x, y) boxes. See [[graft.functions.HilbertExpression]].
    */
  def hilbertKey(x: Column, y: Column): Column =
    graft.functions.HilbertExpression.hilbertKey(
      x.cast("long"), y.cast("long"))

  /** Repartition into `numFiles` z-contiguous ranges and sort within
    * each — the physical layout step before a parquet write. The key
    * column is dropped from the result: it is a layout device, not
    * data.
    */
  def clusterByZOrder(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__zkey", zKey(xCol, yCol))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }

  /** [[clusterByZOrder]] along the Hilbert curve — tighter per-file
    * (x, y) boxes at the same file count (LayoutSpec measures the
    * skipping win over both the 1-d sort and the z-order layout).
    * Dimensions must be pre-scaled into [0, 2^16).
    */
  def clusterByHilbert(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__hkey", hilbertKey(xCol, yCol))
      .repartitionByRange(numFiles, col("__hkey"))
      .sortWithinPartitions(col("__hkey"))
      .drop("__hkey")
  }

  /** The d-dimensional Hilbert key (2 ≤ d ≤ 4), `bits` bits per
    * dimension — for tables clustered on MORE than two columns, where
    * [[hilbertKey]]'s 2-d transform would have to drop dimensions.
    * Skilling's transpose algorithm (see
    * [[graft.functions.HilbertExpression.axesToHilbert]]); dimensions
    * must be pre-scaled into [0, 2^bits).
    */
  def hilbertKeyN(bits: Int)(coords: Column*): Column =
    graft.functions.HilbertExpression.hilbertKeyN(bits)(
      coords.map(_.cast("long")): _*)

  /** [[clusterByHilbert]] over d dimensions: range-repartition +
    * in-partition sort on the d-dimensional Hilbert key. A 100 TB
    * table probed by (x, y, z) boxes gets per-file min/max bounds on
    * ALL THREE axes (LayoutSpec measures the 3-d skipping win over
    * both the 1-d sort and the 2-d keys).
    */
  def clusterByHilbertN(
      df: DataFrame,
      numFiles: Int,
      bits: Int,
      coords: Column*): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__hkey", hilbertKeyN(bits)(coords: _*))
      .repartitionByRange(numFiles, col("__hkey"))
      .sortWithinPartitions(col("__hkey"))
      .drop("__hkey")
  }

  /** d-dimensional Morton key (2 ≤ d ≤ 4), `bits` bits per dimension
    * — [[zKey]]'s variadic sibling and [[hilbertKeyN]]'s z-order
    * counterpart (same MSB-first bit packing, no rotation).
    */
  def zKeyN(bits: Int)(coords: Column*): Column =
    graft.functions.ZOrderExpression.zOrderKeyN(bits)(
      coords.map(_.cast("long")): _*)

  /** [[clusterByZOrder]] over d dimensions. */
  def clusterByZOrderN(
      df: DataFrame,
      numFiles: Int,
      bits: Int,
      coords: Column*): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__zkey", zKeyN(bits)(coords: _*))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }

  /** Persist `df` as a BUCKETED, bucket-sorted catalog table: rows are
    * hash-distributed on `bucketCol` into `numBuckets` files per write
    * task, and each bucket file is sorted on the key.
    *
    * This is the pay-once co-location layout for the 100 TB fact-to-
    * fact join: two tables bucketed on their join key with the same
    * bucket count join WITHOUT EITHER SIDE SHUFFLING — Catalyst sees
    * `HashPartitioning(key, n)` already satisfied on both sides and
    * plans a sort-merge join with zero Exchange operators, so the
    * dominant cost of every subsequent join/groupBy on that key (a
    * full re-shuffle of the fact table, per query) is paid once at
    * write time instead. Aggregations on the bucket key skip their
    * exchange the same way.
    *
    * Spark's bucketing lives in the catalog (bucket spec + file-name
    * contract), hence `saveAsTable` rather than a bare path write.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      path: Option[String] = None): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Compaction planning over a file/partition inventory: assign
    * sort-ordered entries to output bins by cumulative byte offset —
    * bin = floor(bytes-before / target) — and roll up each bin's
    * file count, payload, and key range. This is the OPTIMIZE /
    * small-file-compaction planner readout: which inputs coalesce
    * into which target-sized outputs, preserving the sort order so
    * each output file stays range-prunable.
    *
    * Offset binning (vs per-bin greedy first-fit) is deliberately a
    * pure prefix function: deterministic under any partitioning,
    * no sequential fold. A bin can exceed `target` by at most one
    * entry's bytes — the same tolerance file compactors accept.
    *
    * The input is an INVENTORY (one row per file/partition — bounded
    * by file count, not data size); the prefix sum over it is a
    * driver-scale window the caller sizes, not a data-path scan.
    * All arithmetic is exact longs; positive operands make Spark's
    * `div` and the oracle's `//` agree.
    *
    * @return (bin, n_files, bytes, first_key, last_key)
    */
  def compactionBins(
      inventory: DataFrame,
      keyCol: Column,
      bytesCol: Column,
      target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
    inventory
      .select(keyCol.as("k"), bytesCol.cast("long").as("bytes"))
      .withColumn("off", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"off div ${target}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bytes"),
        min("k").as("first_key"), max("k").as("last_key"))
  }
}
