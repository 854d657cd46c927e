package graft.source.github

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process stand-in for the reference's Flask mock
  * (mock_github_api.py): 5 PRs over 2 pages with Link-header
  * pagination, per-PR commits (+detail files), reviews (one null
  * user), issue comments (one null body, one null user), App-auth
  * endpoints, and an optional one-shot 403 rate-limit trip.
  */
class MockGithubServer {
  val requestCount = new AtomicInteger(0)
  /** Requests per repo name (for pushdown-pruning assertions). */
  val repoRequests = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile var rateLimitOnce: Boolean = false
  private val rateLimitTripped = new AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"

  private def prJson(n: Int): String = {
    // page-2 PR #4 has no "number" → must stay unenriched and be
    // dropped by the transform; #5 uses the nonstandard timestamp.
    val numberField = if (n == 4) "" else s""""number": $n,"""
    val ts = if (n == 5) "2023-01-05 10:30:00Z" else s"2023-01-0${n}T10:30:00Z"
    val merged = if (n % 2 == 0) "null" else s""""$ts""""
    s"""{$numberField "title": "Bug ${1000000 + n} - change $n", "state": "${if (n % 2 == 0) "open" else "closed"}",
        "created_at": "$ts", "updated_at": "$ts", "merged_at": $merged,
        "labels": [{"name": "L$n"}]}"""
  }

  private def commitsJson(pr: Int): String =
    s"""[{"sha": "sha$pr-1", "commit": {"author": {"name": "dev$pr", "email": "d@x", "date": "2023-01-0${pr}T11:00:00Z"}}},
         {"sha": "sha$pr-2", "commit": {"author": {"name": "dev$pr", "email": "d@x", "date": "2023-01-0${pr}T12:00:00Z"}}}]"""

  private def commitDetailJson(sha: String): String =
    s"""{"sha": "$sha", "files": [
         {"filename": "$sha/a.scala", "additions": 5, "deletions": 2, "status": "modified"},
         {"filename": "$sha/b.scala", "additions": 1, "deletions": 0, "status": "added"}]}"""

  private def reviewsJson(pr: Int): String =
    s"""[{"id": ${7000 + pr}, "user": {"login": "rev$pr"}, "state": "APPROVED", "submitted_at": "2023-01-0${pr}T13:00:00Z"},
         {"id": ${7100 + pr}, "user": null, "state": "COMMENTED", "submitted_at": "2023-01-0${pr}T14:00:00Z"},
         {"id": ${7200 + pr}, "user": {"login": "rev${pr}b"}, "state": "CHANGES_REQUESTED", "submitted_at": "2023-01-0${pr}T15:00:00Z"}]"""

  private def commentsJson(pr: Int): String =
    s"""[{"id": ${9000 + pr}, "user": {"login": "u$pr"}, "body": "looks good $pr", "created_at": "2023-01-0${pr}T16:00:00Z", "pull_request_review_id": ${7000 + pr}},
         {"id": ${9100 + pr}, "user": null, "body": "dropped", "created_at": "2023-01-0${pr}T16:01:00Z", "pull_request_review_id": null},
         {"id": ${9200 + pr}, "user": {"login": "u${pr}b"}, "body": "", "created_at": "2023-01-0${pr}T16:02:00Z", "pull_request_review_id": null}]"""

  private def respond(ex: HttpExchange, status: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    ex.getResponseHeaders.set("X-RateLimit-Remaining", "4999")
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/", (ex: HttpExchange) => {
    requestCount.incrementAndGet()
    val path = ex.getRequestURI.getPath
    "/repos/([^/]+/[^/]+)".r.findFirstMatchIn(path).foreach { m =>
      repoRequests.merge(m.group(1), 1, (a, b) => a + b)
    }
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    if (rateLimitOnce && rateLimitTripped.compareAndSet(0, 1)) {
      respond(ex, 403, """{"message": "rate limited"}""", Map(
        "X-RateLimit-Remaining" -> "0",
        "X-RateLimit-Reset" -> (System.currentTimeMillis() / 1000).toString))
    } else path match {
      case p if p.endsWith("/pulls") =>
        val page = "(?:^|&)page=(\\d+)".r.findFirstMatchIn(query).map(_.group(1).toInt).getOrElse(1)
        if (page == 1)
          respond(ex, 200, s"[${prJson(1)},${prJson(2)},${prJson(3)}]",
            Map("Link" -> (s"""<$url/repos/o/r/pulls?per_page=3&page=2>; rel="next", """ +
              s"""<$url/repos/o/r/pulls?per_page=3&page=2>; rel="last"""")))
        else
          respond(ex, 200, s"[${prJson(4)},${prJson(5)}]",
            Map("Link" -> s"""<$url/repos/o/r/pulls?per_page=3&page=2>; rel="last""""))
      case p if p.matches(".*/pulls/\\d+/commits") =>
        respond(ex, 200, commitsJson(p.split("/").takeRight(2).head.toInt))
      case p if p.matches(".*/commits/[^/]+") =>
        respond(ex, 200, commitDetailJson(p.split("/").last))
      case p if p.matches(".*/pulls/\\d+/reviews") =>
        respond(ex, 200, reviewsJson(p.split("/").takeRight(2).head.toInt))
      case p if p.matches(".*/issues/\\d+/comments") =>
        respond(ex, 200, commentsJson(p.split("/").takeRight(2).head.toInt))
      case p if p.endsWith("/installation") =>
        respond(ex, 200, """{"id": 42}""")
      case p if p.matches(".*/app/installations/\\d+/access_tokens") =>
        respond(ex, 201,
          s"""{"token": "tok-${requestCount.get}", "expires_at": "${java.time.Instant.now.plusSeconds(3600)}"}""")
      case _ =>
        respond(ex, 404, s"""{"message": "not found: $path"}""")
    }
  })

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
}
