package graft.source.github

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP layer with the reference's retry policy (main.py:380-423):
  * 200/expected → return; 403 with `X-RateLimit-Remaining: 0` → sleep
  * until `X-RateLimit-Reset` then retry forever; anything else is a
  * fatal job error. Clock and sleeper are injectable for tests.
  *
  * Two documented GitHub behaviors the reference never modeled are
  * handled on top:
  *
  *  - '''secondary rate limits''': 403/429 WITHOUT
  *    `X-RateLimit-Remaining: 0`, carrying `Retry-After` seconds —
  *    the abuse limiter. Previously these hit the fail-fast branch
  *    and aborted the job; now the advertised delay is honored,
  *    within the same bounded retry budget.
  *  - '''conditional requests''' ([[getConditional]]): responses
  *    carry an `ETag`; replaying the URL with `If-None-Match` answers
  *    `304 Not Modified` with an empty body, and 304s do not count
  *    against the primary rate limit — the documented way to stretch
  *    the budget across the per-PR child fetches, which are exactly
  *    the URLs a daily snapshot re-visits mostly unchanged.
  */
final case class GithubResponse(
    status: Int,
    body: String,
    headers: Map[String, String]) {
  def header(name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
}

class GithubApiError(msg: String) extends RuntimeException(msg)

class GithubHttp(
    sleeper: Long => Unit = millis => Thread.sleep(millis),
    clock: () => Long = () => System.currentTimeMillis() / 1000L) {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30))
    // renamed/transferred repos answer 301; the reference's
    // requests.Session follows redirects transparently
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  protected def send(url: String, method: String, headers: Map[String, String]): GithubResponse = {
    val builder = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(60))
    headers.foreach { case (k, v) => builder.header(k, v) }
    val req = (method match {
      case "POST" => builder.POST(HttpRequest.BodyPublishers.noBody())
      case _ => builder.GET()
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val hdrs = {
      import scala.jdk.CollectionConverters._
      resp.headers().map().asScala.map { case (k, v) =>
        k -> v.asScala.headOption.getOrElse("")
      }.toMap
    }
    GithubResponse(resp.statusCode(), resp.body(), hdrs)
  }

  private def isRateLimited(r: GithubResponse): Boolean =
    r.status == 403 && r.header("X-RateLimit-Remaining").map(_.trim).contains("0")

  /** Secondary (abuse) rate limit: 403 or 429 that is NOT the primary
    * remaining-0 shape, with a `Retry-After` hint. A 403 carrying
    * neither remaining-0 nor Retry-After stays a fatal error — real
    * permission failures must not be retried into.
    */
  private def isSecondaryLimited(r: GithubResponse): Boolean =
    (r.status == 403 || r.status == 429) && !isRateLimited(r) &&
      r.header("Retry-After").isDefined

  /** Floor applied when the reset header is absent/invalid, or when a
    * passed reset keeps answering 403 — without it a server that never
    * advertises a usable reset would be hammered in a zero-sleep loop.
    */
  val MinBackoffMs: Long = 5000L

  /** Consecutive rate-limited responses tolerated before the job
    * aborts; a healthy limiter clears after one sleep, so hitting this
    * means the advertised reset is not actually resetting.
    */
  val MaxRateLimitRetries: Int = 20

  /** Milliseconds until the advertised reset second (main.py:380-389);
    * None when the header is absent or unparseable.
    */
  private def resetDelayMs(r: GithubResponse): Option[Long] =
    r.header("X-RateLimit-Reset").flatMap(_.trim.toLongOption)
      .map(reset => math.max(0L, reset - clock()) * 1000L)

  private def sleepForRateLimit(r: GithubResponse, attempt: Int): Unit =
    resetDelayMs(r) match {
      case Some(ms) if ms > 0 => sleeper(ms)
      // reset already passed: retry promptly once (the window usually
      // HAS reset), then assume a stale header and back off
      case Some(_) => sleeper(if (attempt <= 1) 0L else MinBackoffMs)
      case None => sleeper(MinBackoffMs)
    }

  /** GET with the retry-on-rate-limit loop; non-200 aborts the job. */
  def get(url: String, headers: Map[String, String] = Map.empty): GithubResponse =
    getRaw(url, headers, allow304 = false)

  private def getRaw(
      url: String,
      headers: Map[String, String],
      allow304: Boolean): GithubResponse = {
    var rateLimited = 0
    while (true) {
      val resp = send(url, "GET", headers)
      if (resp.status == 200 || (allow304 && resp.status == 304)) return resp
      val limited = isRateLimited(resp) || isSecondaryLimited(resp)
      if (limited) {
        rateLimited += 1
        if (rateLimited > MaxRateLimitRetries)
          throw new GithubApiError(
            s"GitHub API rate limit did not clear after $MaxRateLimitRetries retries for $url")
        if (isRateLimited(resp)) sleepForRateLimit(resp, rateLimited)
        else sleeper(
          // the secondary limiter's own advertised delay; an
          // unparseable header falls back to the floor
          resp.header("Retry-After").flatMap(_.trim.toLongOption)
            .map(s => math.max(0L, s) * 1000L).getOrElse(MinBackoffMs))
      } else throw new GithubApiError(
        s"GitHub API error ${resp.status} for $url: " +
          (if (resp.body.isEmpty) "No response text" else resp.body))
    }
    throw new IllegalStateException("unreachable")
  }

  /** Most entries an ETag cache holds before evicting its
    * least-recently-used URL — bounds driver memory on scans visiting
    * millions of child URLs while keeping the hot per-PR re-fetch set
    * resident.
    */
  val EtagCacheMaxEntries: Int = 10000

  /** Byte bound on the cache's accumulated response bodies: the entry
    * bound alone is not a memory bound — commit-detail responses carry
    * complete `files` arrays and can run hundreds of KB each, so 10k
    * entries could hold multi-GB on the driver. LRU entries are
    * evicted until the body total fits.
    */
  val EtagCacheMaxBytes: Long = 64L * 1024 * 1024

  private var etagCacheBytes: Long = 0L

  private def entryBytes(e: (String, GithubResponse)): Long =
    // String is UTF-16 on heap; 2 bytes/char approximates the real
    // footprint of body + etag without walking header maps
    2L * (e._2.body.length + e._1.length)

  private val etagCache =
    new java.util.LinkedHashMap[String, (String, GithubResponse)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, GithubResponse)]): Boolean = {
        // evict-by-bytes is done in put(); only the entry bound here
        // (removeEldestEntry can drop at most one entry per insert)
        val evict = size() > EtagCacheMaxEntries
        if (evict) etagCacheBytes -= entryBytes(e.getValue)
        evict
      }
    }

  private def etagCachePut(url: String, etag: String, resp: GithubResponse): Unit =
    etagCache.synchronized {
      Option(etagCache.remove(url)).foreach(old =>
        etagCacheBytes -= entryBytes(old))
      val e = (etag, resp)
      val bytes = entryBytes(e)
      if (bytes <= EtagCacheMaxBytes) { // oversized bodies never cached
        etagCache.put(url, e)
        etagCacheBytes += bytes
        // shed least-recently-used entries until the byte budget holds
        val it = etagCache.entrySet().iterator()
        while (etagCacheBytes > EtagCacheMaxBytes && it.hasNext) {
          val eldest = it.next()
          if (eldest.getKey != url) {
            etagCacheBytes -= entryBytes(eldest.getValue)
            it.remove()
          }
        }
      }
    }

  /** [[get]] with conditional-request caching: replays of a URL send
    * `If-None-Match`; a 304 serves the cached body without spending
    * primary-rate-limit budget. Rate-limit retries apply unchanged.
    */
  def getConditional(
      url: String,
      headers: Map[String, String] = Map.empty): GithubResponse = {
    val cached = etagCache.synchronized(Option(etagCache.get(url)))
    val h = cached.map(c => headers + ("If-None-Match" -> c._1)).getOrElse(headers)
    val resp = getRaw(url, h, allow304 = cached.isDefined)
    if (resp.status == 304) cached.get._2
    else {
      resp.header("ETag").foreach(t => etagCachePut(url, t, resp))
      resp
    }
  }

  /** POST for the token exchange; single rate-limit retry like the
    * reference (main.py:96-144), status validation left to callers.
    */
  def post(url: String, headers: Map[String, String] = Map.empty): GithubResponse = {
    val resp = send(url, "POST", headers)
    if (isRateLimited(resp)) {
      sleepForRateLimit(resp, attempt = 1)
      send(url, "POST", headers)
    } else resp
  }
}
