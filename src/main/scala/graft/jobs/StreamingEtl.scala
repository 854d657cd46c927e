package graft.jobs

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.streaming.Trigger

import graft.model.GithubSchemas
import graft.sink.{SnapshotSink, SnapshotWriter}
import graft.source.github.GithubSource
import graft.transform.GithubTransform

/** Streaming ETL: the reference's chunk loop (main.py:871-898)
  * expressed as a Structured Streaming query over the micro-batch
  * GitHub source — each micro-batch of PR pages is parsed,
  * transformed, and appended to the snapshot through `foreachBatch`,
  * with the page cursor checkpointed so a crashed or stopped run
  * resumes mid-scan instead of starting over (the capability the
  * hand-rolled loop never had).
  *
  * Write semantics mirror [[ChunkedEtl]] (and the reference): one
  * up-front partition DELETE for this run's (snapshot_date, repo)
  * pairs, then WRITE_APPEND per micro-batch. The delete runs ONLY on
  * a fresh run (no checkpoint yet) — a resumed run must keep the
  * batches it already appended. Appends within a batch are
  * at-least-once under crash-retry, exactly like the reference's
  * per-chunk WRITE_APPEND.
  */
object StreamingEtl {

  final case class StreamStats(batches: Long, rows: Long)

  def run(
      spark: SparkSession,
      repos: Seq[String],
      opts: GithubSource.Options,
      sink: SnapshotSink,
      snapshotDate: Date,
      checkpointDir: String,
      maxPagesPerTrigger: Option[Int] = None): StreamStats = {

    val freshRun = !java.nio.file.Files.exists(java.nio.file.Paths.get(checkpointDir))
    if (freshRun) repos.foreach(r => sink.deleteSnapshot(r, snapshotDate))

    var reader = spark.readStream.format("graft.source.github.GithubDataSource")
      .option("repos", repos.mkString(","))
      .option("apiUrl", opts.apiUrl)
      .option("chunkSize", opts.chunkSize.toString)
    opts.token.foreach(t => reader = reader.option("token", t))
    opts.appId.foreach(id => reader = reader.option("appId", id))
    opts.privateKeyPem.foreach(k => reader = reader.option("privateKey", k))
    maxPagesPerTrigger.foreach(pp =>
      reader = reader.option("maxPagesPerTrigger", pp.toString))

    var batches = 0L
    var rows = 0L
    val writeBatch: (DataFrame, Long) => Unit = { (batch, _) =>
      val typed = batch
        .select(col("repo"),
          from_json(col("value"), GithubSchemas.rawPullRequest).as("pr"))
        .select((col("repo") +: GithubSchemas.rawPullRequest
          .fieldNames.map(f => col(s"pr.$f"))): _*)
        // each of the four table writes below consumes this frame; a
        // micro-batch is one page per repo, so the cache is small and
        // saves re-parsing the JSON four times
        .persist()
      try {
        val t = GithubTransform.applyMulti(typed, snapshotDate)
        for ((name, df) <- SnapshotWriter.TableNames.zip(Seq(
            t.pullRequests, t.commits, t.reviewers, t.comments))) {
          sink.append(name, df)
        }
        batches += 1
        rows += typed.count()
      } finally typed.unpersist()
    }

    val q = reader.load().writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(writeBatch)
      .start()
    q.awaitTermination()

    repos.foreach(r => sink.finalizeSnapshot(r, snapshotDate))
    StreamStats(batches, rows)
  }
}
