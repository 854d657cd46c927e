package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BatchId-versioned store for foreachBatch fold state.
  *
  * The fold twins (e.g. [[EventStreams.smoothedRatesFold]]) carry an
  * accumulated partials frame across micro-batches. Folding INTO one
  * mutable table is at-least-once under crash-replay: Spark re-runs a
  * batch whose `commits/N` entry is missing, and a re-fold
  * double-counts that batch's rows. This store versions the partials
  * by batchId instead — '''replace, never accumulate''':
  *
  *  - batch N's fold reads the newest '''committed''' version `< N`
  *    and writes its result to `v<N>` with `mode("overwrite")`, so a
  *    replay recomputes `v<N>` from the same input to the same bytes;
  *  - a version is committed by a `_committed/<N>` marker written
  *    AFTER the parquet write completes; a replay of an
  *    already-committed batch is a marker-gated no-op;
  *  - readers resolve the newest committed version, so a partial
  *    `v<N>` from a crashed write is never visible;
  *  - committed versions older than the newest are reaped (marker
  *    first, then data — a reader can never select a marker whose
  *    data is gone).
  *
  * Every crash point replays to the same state, which is what lets
  * the fold twins claim bit-equality with their batch operators even
  * across failures.
  */
object FoldStore {

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def versionDir(root: Path, batchId: Long) = new Path(root, s"v$batchId")
  private def markerDir(root: Path) = new Path(root, "_committed")
  private def marker(root: Path, batchId: Long) =
    new Path(markerDir(root), batchId.toString)

  private def committedVersions(f: FileSystem, root: Path): Seq[Long] = {
    val dir = markerDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(s =>
      scala.util.Try(s.getPath.getName.toLong).toOption)
  }

  def isCommitted(spark: SparkSession, root: String, batchId: Long): Boolean = {
    val (f, p) = fs(spark, root)
    f.exists(marker(p, batchId))
  }

  /** Newest committed partials, or `empty` when no fold has committed
    * yet (first batch, or a crash before the first commit).
    */
  def read(spark: SparkSession, root: String, empty: DataFrame): DataFrame = {
    val (f, p) = fs(spark, root)
    committedVersions(f, p).sorted.lastOption match {
      case Some(v) => spark.read.parquet(versionDir(p, v).toString)
      case None => empty
    }
  }

  /** Fold batch `batchId`: apply `fold` to the newest committed
    * version `< batchId` (or `empty`), persist as `v<batchId>`,
    * commit, reap older versions. Idempotent per batchId — a replay
    * of a committed batch is a no-op; a replay of a crashed one
    * recomputes the identical version.
    */
  def foldCommit(
      spark: SparkSession,
      root: String,
      batchId: Long,
      empty: DataFrame)(fold: DataFrame => DataFrame): Unit = {
    val (f, p) = fs(spark, root)
    if (f.exists(marker(p, batchId))) return
    val prior = committedVersions(f, p).filter(_ < batchId).sorted.lastOption
    val stored = prior match {
      case Some(v) => spark.read.parquet(versionDir(p, v).toString)
      case None => empty
    }
    fold(stored).write.mode("overwrite")
      .parquet(versionDir(p, batchId).toString)
    f.mkdirs(markerDir(p))
    f.create(marker(p, batchId), true).close()
    // reap: every older committed version is now unreachable by read()
    for (v <- committedVersions(f, p).filter(_ < batchId)) {
      f.delete(marker(p, v), false)
      f.delete(versionDir(p, v), true)
    }
  }
}
