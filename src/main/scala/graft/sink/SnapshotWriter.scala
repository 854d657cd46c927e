package graft.sink

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.transform.GithubTransform.GithubTables

/** Idempotent snapshot sink (reference K1-K5, main.py:552-743).
  *
  * The reference's probe-then-DELETE-then-append dance
  * (snapshot_exists → delete_existing_snapshot → WRITE_APPEND load
  * jobs) collapses in Spark to **dynamic partition overwrite** on
  * tables partitioned by (snapshot_date, target_repository): a rerun
  * replaces exactly the partitions it writes and leaves every other
  * (date, repo) pair untouched. The probe becomes metadata-only
  * partition pruning.
  *
  * At 100 TB this partitioning is also the query-side win: per-day /
  * per-repo reads prune to single partitions, and daily reruns never
  * rewrite history.
  */
object SnapshotWriter {

  val TableNames = Seq("pull_requests", "commits", "reviewers", "comments")

  /** Write the four tables under `rootDir/<table>/`, replacing only
    * the touched (snapshot_date, target_repository) partitions.
    * Empty inputs are skipped (K5: empty per-table list → skip).
    */
  def write(tables: GithubTables, rootDir: String, skipIfEmpty: Boolean = true,
      fmt: String = "parquet"): Unit = {
    val dfs = TableNames.zip(Seq(
      tables.pullRequests, tables.commits, tables.reviewers, tables.comments))
    for ((name, df) <- dfs) {
      writeTable(df, s"$rootDir/$name", skipIfEmpty, fmt)
    }
  }

  /** `skipIfEmpty=false` drops the `isEmpty` probe action — writing an
    * empty DataFrame is harmless (no partition directories appear),
    * and callers whose input is expensive to recompute (the DSv2 API
    * extraction) must not pay an extra action per table.
    */
  def writeTable(df: DataFrame, path: String, skipIfEmpty: Boolean = true,
      fmt: String = "parquet"): Unit = {
    if (!skipIfEmpty || !df.isEmpty) {
      df.write
        .mode("overwrite")
        // per-write option, NOT session conf: a shared session must not
        // be left in dynamic mode behind the caller's back
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("snapshot_date", "target_repository")
        .format(fmt).save(path)
    }
  }

  /** Schema-evolving read of the whole partitioned table: snapshots
    * written before a column existed surface it as null instead of
    * failing the scan. By default Spark takes one file's footer as
    * the table schema, so a reader pinned to an OLD footer silently
    * DROPS columns added by later snapshots — `mergeSchema` unions
    * footers across all snapshot partitions (same option key for
    * parquet and ORC). Partition pruning on snapshot_date /
    * target_repository is unaffected: the merge touches footers, not
    * the directory-derived partition columns.
    */
  def readTable(spark: SparkSession, path: String,
      fmt: String = "parquet"): DataFrame =
    spark.read.option("mergeSchema", "true").format(fmt).load(path)

  /** Explicit partition delete (reference K1 DELETE, main.py:604-638):
    * removes the (snapshot_date, repo) partition directory of every
    * table. ChunkedEtl calls this once up front so per-chunk appends
    * are idempotent under rerun even when a table is empty in the
    * first chunk (dynamic overwrite alone can't clear a partition it
    * writes no rows to).
    */
  /** Hive-style partition directory for (table, repo, date) — uses
    * the SAME escaping Spark's writer uses for partition directories.
    * URLEncoder agrees for '/' but diverges on space ('+' vs '%20'),
    * '*', '~', ... and a mismatched name would silently skip deletes,
    * leaving stale rows on rerun.
    */
  def partitionPath(
      rootDir: String,
      table: String,
      repo: String,
      snapshotDate: Date): String = {
    val escapedRepo = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(repo)
    s"$rootDir/$table/snapshot_date=$snapshotDate/target_repository=$escapedRepo"
  }

  def deleteSnapshot(
      spark: SparkSession,
      rootDir: String,
      repo: String,
      snapshotDate: Date): Unit = {
    // resolve the FS from the path, not fs.defaultFS: an s3a:// table
    // root with an HDFS default would otherwise list/delete against
    // the wrong filesystem
    val fs = new org.apache.hadoop.fs.Path(rootDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (table <- TableNames) {
      val dir = new org.apache.hadoop.fs.Path(
        partitionPath(rootDir, table, repo, snapshotDate))
      if (fs.exists(dir)) fs.delete(dir, true)
      // ALSO clear compaction staging siblings: a .compact_old_ copy
      // left by a crashed swap would otherwise survive the delete and
      // be "self-healed" back by a later compactPartition — deleted
      // rows resurrecting is a breach of the K1 delete contract
      deleteStaging(fs, dir)
    }
  }

  /** Remove the hidden compaction staging siblings of a partition
    * directory (no-op when absent).
    */
  private def deleteStaging(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    val parent = dir.getParent
    if (parent != null) {
      fs.delete(new org.apache.hadoop.fs.Path(parent, s".compact_tmp_${dir.getName}"), true)
      fs.delete(new org.apache.hadoop.fs.Path(parent, s".compact_old_${dir.getName}"), true)
    }
  }

  /** Per-chunk append (reference WRITE_APPEND, main.py:673-677): used
    * by ChunkedEtl after the up-front deleteSnapshot.
    * `skipIfEmpty=false` for callers whose batches are expensive to
    * recompute (the streaming bridge: an isEmpty probe is an extra
    * Spark job per micro-batch, while appending an empty frame is
    * harmless — no partition directories appear).
    */
  def appendTable(df: DataFrame, path: String, skipIfEmpty: Boolean = true,
      fmt: String = "parquet"): Unit =
    if (!skipIfEmpty || !df.isEmpty) {
      df.write
        .mode("append")
        .partitionBy("snapshot_date", "target_repository")
        .format(fmt).save(path)
    }

  /** Exactly-once per-micro-batch append: [[BatchCommit.stageAndPublish]]
    * keyed by (runId, batchId), so a crash-replayed foreachBatch body
    * converges to the same file set instead of appending the batch's
    * rows a second time. The streaming bridges use this; plain
    * [[appendTable]] stays for the non-replayable ChunkedEtl path,
    * whose idempotency comes from the up-front partition delete.
    */
  def appendTableBatch(df: DataFrame, path: String, runId: String,
      batchId: Long, fmt: String = "parquet"): Unit =
    BatchCommit.stageAndPublish(df, path, runId, batchId, fmt)

  /** NDJSON serialization — the exact payload format of the
    * reference's BigQuery load jobs (main.py:673-677 serializes each
    * chunk as newline-delimited JSON). Null fields are kept explicit
    * so downstream schema-on-read matches the parquet tables.
    */
  def writeNdjson(df: DataFrame, path: String): Unit =
    if (!df.isEmpty) {
      df.select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(df.columns.map(col): _*),
        java.util.Collections.singletonMap("ignoreNullFields", "false")).as("value"))
        .write.mode("overwrite").text(path)
    }

  /** Small-file compaction for one (snapshot_date, repo) partition:
    * chunked/streaming appends leave one file per micro-batch per
    * task, and at 100 TB the resulting file-count tax (NameNode/
    * listing pressure, per-file open cost, tiny row groups defeating
    * parquet encodings) dominates read cost. Rewrites the partition
    * as ceil(bytes / targetBytes) files via an atomic
    * rename-after-write: data rewritten next to the partition, the
    * old directory swapped out only after the rewrite succeeds —
    * a crash mid-compaction never loses rows.
    *
    * Data is re-read THROUGH the partition directory (not the table
    * root), so only this partition's files are listed and no other
    * partition is touched — same isolation contract as
    * deleteSnapshot.
    *
    * Single-writer only, and NOT safe to run against a live-read
    * table: between the two swap renames the partition is briefly
    * absent, so a concurrent reader silently under-reports rows
    * rather than serving stale data. The post-load ChunkedEtl call
    * site satisfies both assumptions (compaction runs after the last
    * append, before the table is handed to readers).
    */
  def compactPartition(
      spark: SparkSession,
      rootDir: String,
      table: String,
      repo: String,
      snapshotDate: Date,
      targetBytes: Long = 128L * 1024 * 1024,
      fmt: String = "parquet"): Unit = {
    val dir = partitionPath(rootDir, table, repo, snapshotDate)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Staging dirs are DOT-prefixed siblings: Spark/Hive listing
    // skips '.'/'_'-prefixed names at every level, so readers of the
    // table root never see staged data as a bogus partition (an
    // unhidden '<leaf>._compacting' sibling WOULD be parsed as a
    // partition value and double-count every row mid-swap).
    val parent = dirPath.getParent
    val leaf = dirPath.getName
    val tmp = new org.apache.hadoop.fs.Path(parent, s".compact_tmp_$leaf")
    val old = new org.apache.hadoop.fs.Path(parent, s".compact_old_$leaf")
    // self-heal a crash between the two swap renames of a previous
    // run: the live dir is missing but the pre-compaction copy exists
    if (!fs.exists(dirPath) && fs.exists(old)) {
      if (!fs.rename(old, dirPath))
        throw new java.io.IOException(s"compaction recovery failed for $dir")
    }
    if (!fs.exists(dirPath)) return
    // clear staging debris BEFORE the already-compact early return: a
    // crash after the swap-in but before the old-copy delete leaves a
    // full hidden pre-compaction copy that would otherwise never be
    // reaped (doubled storage + a stale-restore hazard)
    fs.delete(tmp, true); fs.delete(old, true)
    val dataFiles = fs.listStatus(dirPath)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    if (dataFiles.length <= 1) return
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.format(fmt).load(dir).repartition(nFiles)
      .write.mode("overwrite").format(fmt).save(tmp.toString)
    // swap: current -> old, compacted -> current, drop old. A crash
    // before the first rename leaves the original untouched; between
    // the renames, the hidden old copy is restored by the self-heal
    // above on the next call; after, only hidden debris remains.
    if (!fs.rename(dirPath, old)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"compaction swap failed for $dir")
    }
    if (!fs.rename(tmp, dirPath)) {
      fs.rename(old, dirPath) // roll back
      throw new java.io.IOException(s"compaction swap failed for $dir")
    }
    fs.delete(old, true)
  }

  /** S7 existence probe: partition-pruned scan, LIMIT 1 — metadata +
    * at most one row group touched (main.py:552-601).
    */
  def snapshotExists(
      spark: SparkSession,
      rootDir: String,
      repo: String,
      snapshotDate: Date,
      fmt: String = "parquet"): Boolean = {
    val path = s"$rootDir/pull_requests"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) false
    else try {
      !spark.read.format(fmt).load(path)
        .filter(col("snapshot_date") === lit(snapshotDate) &&
          col("target_repository") === lit(repo))
        .limit(1)
        .isEmpty
    } catch {
      // dir exists but holds no readable parquet (e.g. a crashed
      // first write left only _temporary): treat as no snapshot so
      // the rerun can repair it
      case _: org.apache.spark.sql.AnalysisException => false
    }
  }
}
