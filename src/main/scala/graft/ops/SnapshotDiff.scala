package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-style diff between two snapshots of the same table: classify
  * every key as added / removed / changed / unchanged — the
  * incremental-maintenance primitive for the engine's
  * (snapshot_date, repo)-partitioned tables (what changed between two
  * snapshot dates, which rows a downstream consumer must reprocess).
  *
  * Scale shape: one full-outer shuffle join on the key columns; both
  * sides project to keys + compared columns before the shuffle, so
  * untracked payload never moves. Value comparison is null-safe
  * (`<=>`), so NULL→NULL counts as unchanged and NULL→value as
  * changed.
  */
object SnapshotDiff {

  def diffSnapshots(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffSnapshots needs at least one key column")
    val o = oldDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        lit(1L).as("__in_old"): _*)
    val n = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        lit(1L).as("__in_new"): _*)
    val same: Column = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .foldLeft(lit(true))(_ && _)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")).as("change_type"): _*)
  }
}
