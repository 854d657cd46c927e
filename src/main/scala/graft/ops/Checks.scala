package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the contract gate a production
  * pipeline runs before publishing a snapshot (the reference's only
  * guard is row-count logging; at 100 TB silent corruption needs
  * machine-checkable contracts). Every check emits ONE row of a
  * uniform report schema:
  *
  *   (check STRING, violations BIGINT, total BIGINT, passed BOOLEAN)
  *
  * so reports union, store, and diff like any other table.
  *
  * Scale shape: each check is a single aggregation or anti-join over
  * the audited table (map-side combining; the anti-join is an
  * equi-join on the key) — nothing driver-side, no row-level
  * materialization of violations (callers wanting the offending rows
  * re-run the predicate as a filter).
  */
object Checks {

  private def report(name: String, violations: Column, total: Column): Column =
    struct(
      lit(name).as("check"),
      violations.cast("long").as("violations"),
      total.cast("long").as("total"),
      (violations === 0L).as("passed"))

  /** No duplicate values of `cols` (a primary-key contract).
    * Violations = rows beyond the first of each duplicated key.
    */
  def unique(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.agg(report(name,
      count(lit(1)) - count_distinct(struct(cols.map(col): _*)),
      count(lit(1))).as("r"))
      .select(col("r.*"))

  /** No nulls in `c`. */
  def nonNull(df: DataFrame, name: String, c: String): DataFrame =
    df.agg(report(name,
      count(lit(1)) - count(col(c)), count(lit(1))).as("r"))
      .select(col("r.*"))

  /** Every value of `c` inside [lo, hi]. */
  def inRange(
      df: DataFrame, name: String, c: String,
      lo: Double, hi: Double): DataFrame =
    df.agg(report(name,
      sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L)),
      count(lit(1))).as("r"))
      .select(col("r.*"))

  /** Every value of `c` inside the allowed domain. */
  def inDomain(
      df: DataFrame, name: String, c: String,
      allowed: Seq[String]): DataFrame =
    df.agg(report(name,
      sum(when(col(c).isNull || !col(c).isin(allowed: _*), 1L).otherwise(0L)),
      count(lit(1))).as("r"))
      .select(col("r.*"))

  /** Referential integrity: every `childKey` exists in
    * `parent(parentKey)` (violations via left-anti join, counted —
    * never materialized).
    */
  def refIntegrity(
      child: DataFrame, name: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("_t"))
    val orphans = child.select(col(childKey).as("_k"))
      .join(parent.select(col(parentKey).as("_k")), Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("_v"))
    orphans.crossJoin(total)
      .select(report(name, col("_v"), col("_t")).as("r"))
      .select(col("r.*"))
  }

  /** Union a set of single-row check reports into one report table. */
  /** Modulus for [[partitionDigest]]: 2^61, so per-row 60-bit hash
    * values stay strictly below it and the summed digest fits BIGINT
    * after the mod on both engines.
    */
  val DigestMod: Long = 2305843009213693952L

  /** Order-insensitive per-partition content fingerprint: each row
    * hashes to a 60-bit integer (the first 15 hex digits of the md5
    * of a caller-built canonical row string), and a partition's
    * digest is the SUM of its row hashes mod 2^61 — the anti-entropy
    * primitive for reconciling replicated/backfilled snapshots
    * without moving data. Sum (not xor/min) makes the digest
    * INCREMENTALLY MAINTAINABLE under the snapshot sinks' append/
    * delete lifecycle: digest(P ∪ Δ) = (digest(P) + digest(Δ)) mod M
    * and deletes subtract — so a CDC consumer can roll the expected
    * fingerprint forward without rescanning, then compare against a
    * scan only on mismatch. (md5 is the cross-engine contract, as in
    * the dedup family; collisions of a SUM of 60-bit hashes are a
    * reconciliation-grade risk bound, not a security one.)
    *
    * One hash aggregation; the decimal(38) sum keeps the fold exact
    * and order-free at any partition size.
    *
    * @param rowStr canonical row string — deterministic columns only
    *               (integers/strings; no raw doubles, whose
    *               formatting is engine-specific)
    * @return one row per partition: (partCols..., n_rows, digest)
    */
  def partitionDigest(
      df: DataFrame,
      partCols: Seq[String],
      rowStr: Column): DataFrame = {
    val h = conv(substring(md5(rowStr), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.select(partCols.map(col) :+ h.as("h"): _*)
      .groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("h")) % DigestMod).cast("long").as("digest"))
  }

  def reportAll(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionAll _)
}
