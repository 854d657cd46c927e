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
  *
  * '''Single-writer contract.''' One store root belongs to ONE
  * streaming query: the reap step deletes older versions, so two
  * writers interleaving on the same root could each delete the
  * version the other is about to read. The contract is enforced, not
  * just documented — the first [[foldCommit]] pins the caller's
  * `writerTag` (pass the query's checkpoint-pinned runId,
  * [[graft.sink.BatchCommit.pinnedRunId]]) at `<root>/_writer`, and a
  * later writer with a DIFFERENT tag fails loudly instead of racing
  * the reap. A resumed run re-reads the same runId from its
  * checkpoint, so resume keeps working; a second query must take its
  * own root.
  */
object FoldStore {

  private val WriterFileName = "_writer"

  private def fs(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Pin `writerTag` as this root's sole writer, or throw when the
    * root is already claimed by a different tag. Idempotent for the
    * claiming writer (resume re-claims with the same tag).
    */
  private def claimWriter(f: FileSystem, root: Path, writerTag: String): Unit = {
    val p = new Path(root, WriterFileName)
    if (f.exists(p)) {
      val in = f.open(p)
      val owner =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (owner != writerTag)
        throw new IllegalStateException(
          s"FoldStore root $root is owned by writer '$owner'; " +
            s"writer '$writerTag' must use its own root " +
            "(single-writer contract: the reap step is not " +
            "multi-writer safe)")
    } else {
      f.mkdirs(root)
      try {
        val out = f.create(p, false) // no-overwrite: atomic claim
        try out.write(writerTag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      } catch {
        // lost the creation race — re-resolve against the winner
        // (anything else, e.g. permissions, propagates)
        case e: java.io.IOException =>
          if (f.exists(p)) claimWriter(f, root, writerTag) else throw e
      }
    }
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
      empty: DataFrame,
      writerTag: String = "")(fold: DataFrame => DataFrame): Unit = {
    val (f, p) = fs(spark, root)
    // non-empty tag = enforce the single-writer contract (scaladoc
    // above); empty keeps pre-claim roots readable for local tools
    if (writerTag.nonEmpty) claimWriter(f, p, writerTag)
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
