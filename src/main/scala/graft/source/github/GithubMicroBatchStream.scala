package graft.source.github

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}

/** Micro-batch streaming twin of the batch DSv2 scan:
  * `spark.readStream.format("github")`.
  *
  * The reference's ingest loop is a batch chunk walk
  * (main.py:871-898): fetch a page of PRs, enrich, load, repeat. The
  * streaming form expresses the same loop as a Structured Streaming
  * source — the offset IS the per-repo page cursor, so each
  * micro-batch processes the pages that appeared since the last
  * trigger, checkpoint/restart resumes mid-scan for free, and the
  * usual `writeStream` machinery (exactly-once file sinks,
  * foreachBatch into [[graft.sink.SnapshotWriter]]) replaces the
  * hand-rolled chunk loop.
  *
  * Options (beyond the batch ones):
  *  - `maxPagesPerTrigger` (optional int): cap how many pages per
  *    repo one micro-batch may advance — the rate-limit-friendly
  *    backpressure knob (GitHub budgets ~5 000 requests/hour/token,
  *    so unbounded catch-up batches are exactly what an operator
  *    wants to avoid). Applied through admission control
  *    ([[SupportsAdmissionControl]]), so uncaught-up pages are never
  *    dropped — the stream just takes more triggers to drain them.
  *
  * Scale shape: one planning-time page-count probe per repo per
  * trigger (`Link: rel="last"`); fetching stays one partition per
  * repo because rate limits are per-token — the parallelism unit is
  * repos, same as the batch scan. PRs are listed
  * `sort=created&direction=asc`, so page ranges only ever grow and a
  * page cursor is a valid offset.
  */
class GithubMicroBatchStream(
    options: Map[String, String],
    repos: Seq[String],
    fields: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val opts = GithubDataSource.parseOptions(options)
  private val maxPagesPerTrigger: Option[Int] =
    options.get("maxpagespertrigger").flatMap(_.toIntOption)
  maxPagesPerTrigger.foreach(pp => require(pp > 0,
    s"maxPagesPerTrigger must be positive, got $pp"))

  override def initialOffset(): Offset =
    GithubPagesOffset(repos.map(_ -> 0).toMap)

  private def probeLatest(): Map[String, Int] =
    repos.map { repo =>
      val (extractor, refreshAuth) = GithubSource.openExtractor(repo, opts)
      refreshAuth()
      // option-level prune ("state"/"createdMin"/"createdMax") applies
      // to streaming too: the page-count probe must walk the same
      // filtered listing the partition readers will.
      repo -> extractor.pageCount(repo, opts.chunkSize,
        GithubDataSource.parsePrune(options).state)
    }.toMap

  // Trigger.AvailableNow pins the drain target at query start: the
  // capped batches walk toward THIS head, not a moving one, so the
  // query terminates even while new PRs keep landing.
  private var availableNowTarget: Option[Map[String, Int]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(probeLatest())

  private def targetHead(): Map[String, Int] =
    availableNowTarget.getOrElse(probeLatest())

  /** Admission-controlled latest: the true remote head, capped to
    * `start + maxPagesPerTrigger` per repo. The cap must live HERE
    * and not in partition planning — Spark commits the offset this
    * method returns, so pages excluded at plan time would be skipped
    * forever, while pages excluded from admission simply wait for the
    * next trigger.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = GithubPagesOffset.from(start).pages
    val latest = targetHead()
    GithubPagesOffset(latest.map { case (repo, head) =>
      val cap = maxPagesPerTrigger
        .fold(head)(pp => math.min(head, s.getOrElse(repo, 0) + pp))
      repo -> math.max(cap, s.getOrElse(repo, 0))
    })
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset = GithubPagesOffset(probeLatest())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = GithubPagesOffset.from(start).pages
    val e = GithubPagesOffset.from(end).pages
    repos.flatMap { repo =>
      val from = s.getOrElse(repo, 0)
      val to = e.getOrElse(repo, 0)
      if (to > from) Some(GithubPartition(repo, from + 1, to): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GithubReaderFactory(options, fields)

  override def deserializeOffset(json: String): Offset = GithubPagesOffset.parse(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Per-repo page cursor. JSON is a flat object {"owner/repo": page}
  * — repo names (owner/name) never contain quotes or braces, so the
  * regex parse below is exact.
  */
final case class GithubPagesOffset(pages: Map[String, Int]) extends Offset {
  override def json(): String =
    pages.toSeq.sortBy(_._1)
      .map { case (r, p) => s""""$r":$p""" }.mkString("{", ",", "}")
}

object GithubPagesOffset {
  private val entry = """"([^"]+)"\s*:\s*(\d+)""".r

  def parse(json: String): GithubPagesOffset =
    GithubPagesOffset(
      entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toInt).toMap)

  def from(o: Offset): GithubPagesOffset = o match {
    case g: GithubPagesOffset => g
    case other => parse(other.json())
  }
}
