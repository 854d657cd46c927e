package graft.source.github

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.GithubSchemas

/** Driver-side GitHub ingest: pages are pulled sequentially (GitHub
  * rate limits are per-token, so the reference's strictly sequential
  * fetch is the correct default — parallel fan-out just multiplies
  * 403s, SURVEY.md §7.5), parsed against the explicit raw schema, and
  * handed to Spark as a DataFrame.
  *
  * The network-bound extract is deliberately NOT distributed: at
  * 5 000 requests/hour the API — not Spark — is the bottleneck, and
  * keeping token minting on the driver avoids shipping credentials to
  * executors. Everything downstream (transform, dedup, sinks) is
  * fully distributed; the connector boundary is one
  * `spark.createDataset` per run of pages.
  *
  * For multi-token / multi-repo deployments that CAN parallelize,
  * [[GithubDataSource]] exposes the same extraction as a DataSource
  * V2 `format("github")` with one input partition per repo.
  */
object GithubSource {

  final case class Options(
      apiUrl: String = "https://api.github.com",
      chunkSize: Int = 100,
      appId: Option[String] = None,
      privateKeyPem: Option[String] = None,
      token: Option[String] = None)

  /** All enriched PR docs for `repo` as a typed DataFrame. */
  def read(spark: SparkSession, repo: String, opts: Options): DataFrame = {
    import spark.implicits._
    val jsons = fetchRaw(repo, opts)
    spark.read.schema(GithubSchemas.rawPullRequest).json(jsons.toDS)
  }

  /** Single wiring point for extractor construction: HTTP client,
    * optional App-auth token manager, current-token state, and the
    * per-page refresh hook (main.py:845-869). Every consumer —
    * driver-side read, DSv2 partition reader, chunked ETL — goes
    * through here so auth policy can't drift between them.
    *
    * Returns the extractor and the refreshAuth callback to pass to
    * `pages`.
    */
  def openExtractor(repo: String, opts: Options): (GithubExtractor, () => Unit) = {
    val http = new GithubHttp()
    val tokenManager = for {
      id <- opts.appId
      pem <- opts.privateKeyPem
    } yield new GithubTokenManager(id, pem, opts.apiUrl, http)
    var currentToken: Option[String] = opts.token
    def authHeaders(): Map[String, String] =
      Map("Accept" -> "application/vnd.github+json",
        "X-GitHub-Api-Version" -> "2022-11-28") ++
        currentToken.map(t => "Authorization" -> s"Bearer $t")
    val extractor = new GithubExtractor(http, opts.apiUrl, () => authHeaders())
    (extractor, () => tokenManager.foreach(tm => currentToken = Some(tm.token(repo))))
  }

  /** Enriched PR JSON lines (driver-side, sequential, rate-limited). */
  def fetchRaw(repo: String, opts: Options): Seq[String] = {
    val (extractor, refreshAuth) = openExtractor(repo, opts)
    extractor.pages(repo, opts.chunkSize, refreshAuth).flatten.toSeq
  }
}
