package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse an
  * event log of attribute observations into validity intervals —
  * one row per (key, attribute run) with [valid_from, valid_to) and a
  * current flag. The warehouse-side twin of [[SnapshotDiff]]: diff
  * answers "what changed between two snapshots", this answers "what
  * was true when" over the full log.
  *
  * Scale shape: one shuffle on the key; both windows (change
  * detection via lag, interval close via lead) share the same
  * partitioning and sort order, so Catalyst plans ONE exchange and
  * ONE sort feeding two Window operators. No joins, no state beyond
  * the sort.
  *
  * Determinism: rows order by (ts, ordCol) — callers pass a unique
  * tie-break column so duplicate timestamps cannot flip run
  * boundaries between engines. Change detection is null-safe
  * (`<=>`): a null attribute is a value, and a null→null step is NOT
  * a change.
  */
object Scd {

  /** (key, attr, valid_from, valid_to, is_current): `valid_to` is the
    * ts of the next change (exclusive bound), null on the open run.
    */
  def scd2History(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(ordCol).asc)
    log
      .select(col(keyCol), col(tsCol), col(ordCol), col(attrCol))
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .withColumn("is_change",
        lag(col(ordCol), 1).over(w).isNull || !(col("prev_attr") <=> col(attrCol)))
      .filter(col("is_change"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(
        col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Point-in-time lookup against an SCD2 history: for each fact row,
    * the single history version whose half-open validity interval
    * [valid_from, valid_to) contains the fact timestamp (null
    * valid_to = open run). The warehouse "as the dimension WAS when
    * the fact happened" join — distinct from [[graft.ops.AsOf]],
    * which takes the latest event ≤ ts with no interval semantics:
    * a fact BEFORE the key's first version matches nothing here (left
    * join → null attr) instead of silently binding a later version.
    *
    * Scale shape: one equi-join on the key with the interval test as
    * the join residual — versions per key are few (that is what SCD2
    * compaction is for), so the residual filters a short run per
    * probe, never a range explosion. Intervals are disjoint by
    * construction, so at most one version matches (exactly one for
    * in-range probes); empty intervals from same-timestamp changes
    * can never match a half-open test.
    *
    * @return fact (key, ts) plus the matched version's attr and
    *         valid_from (null when the probe predates the history).
    */
  /** SCD Type 1 — changelog compaction to latest-wins: one row per
    * key carrying the attributes of its most recent change (by the
    * unique (ts, ord) pair). The upsert/MERGE materialization every
    * lakehouse table maintenance job runs; the complement of
    * [[scd2History]], which keeps all versions.
    *
    * Scale shape: a single hash aggregation — `max` over a struct
    * whose leading fields are the version order, so the argmax
    * partial-combines map-side (the shuffle carries one candidate
    * struct per key per partition, never the changelog). No window,
    * no sort, no join. Determinism: (ts, ord) is unique, so the
    * struct comparison never reaches the payload fields.
    */
  def latestSnapshot(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val fields = Seq(col(tsCol), col(ordCol)) ++ payloadCols.map(col)
    changes
      .groupBy(col(keyCol))
      .agg(max(struct(fields: _*)).as("s"))
      .select(col(keyCol) +:
        col(s"s.$tsCol").as(s"last_$tsCol") +:
        col(s"s.$ordCol").as(s"last_$ordCol") +:
        payloadCols.map(c => col(s"s.$c").as(s"last_$c")): _*)
  }

  /** CDC apply: fold a changelog of upserts and deletes into a base
    * snapshot — the MERGE INTO every lakehouse table maintenance job
    * runs. The winner per key is the highest (ts, ord) version across
    * base ∪ changes (base rows enter at their own stored version);
    * a winning 'D' drops the key, a winning 'U' replaces the payload,
    * untouched keys pass through.
    *
    * Scale shape: one struct-argmax hash aggregation over
    * base ∪ changes — partial-combining, no window, no join; the
    * changelog never has to be sorted or replayed in order, because
    * the version pair makes the fold order-free.
    */
  def applyChangeLog(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val cols = Seq(tsCol, ordCol) ++ payloadCols
    val b = base.select(
      col(keyCol) +: lit("U").as("_op") +: cols.map(col): _*)
    val c = changes.select(
      col(keyCol) +: col(opCol).as("_op") +: cols.map(col): _*)
    val fields = Seq(col(tsCol), col(ordCol), col("_op")) ++ payloadCols.map(col)
    b.unionAll(c)
      .groupBy(col(keyCol))
      .agg(max(struct(fields: _*)).as("s"))
      .filter(col("s._op") =!= "D")
      .select(col(keyCol) +: col(s"s.$tsCol").as(tsCol) +:
        col(s"s.$ordCol").as(ordCol) +:
        payloadCols.map(p => col(s"s.$p").as(p)): _*)
  }

  def pointInTime(
      facts: DataFrame,
      history: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCol: String): DataFrame = {
    val h = history.select(
      col(keyCol).as("__hk"), col(attrCol),
      col("valid_from"), col("valid_to"))
    facts.select(col(keyCol), col(tsCol))
      .join(h,
        col(keyCol) === col("__hk") &&
          col("valid_from") <= col(tsCol) &&
          (col("valid_to").isNull || col(tsCol) < col("valid_to")),
        "left")
      .select(col(keyCol), col(tsCol), col(attrCol), col("valid_from"))
  }
}
