package graft.source.github

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyFactory, PrivateKey, Signature}
import java.security.spec.PKCS8EncodedKeySpec
import java.time.Instant
import java.util.Base64

/** GitHub App authentication, mirroring the reference's token
  * machinery (main.py:40-163) with zero non-JDK dependencies:
  *
  *  - short-lived RS256 app JWT: iat backdated 60 s for clock skew,
  *    exp now+540 s (GitHub max is 600) — main.py:55-59;
  *  - PEM `\n` normalization for env-var-delivered keys
  *    (main.py:769-773);
  *  - installation lookup + token exchange with caching: the
  *    repo→installation mapping is cached forever, tokens per
  *    installation id and refreshed when <60 s of TTL remain
  *    (main.py:64-163).
  */
object GithubAuth {

  /** Env vars serialize newlines as literal "\n" (main.py:769-773). */
  def normalizePem(pem: String): String = pem.replace("\\n", "\n")

  private def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  /** Parse an RSA private key from PEM. Accepts PKCS#8
    * ("BEGIN PRIVATE KEY") directly and PKCS#1
    * ("BEGIN RSA PRIVATE KEY", GitHub's download format) by wrapping
    * the DER in a PKCS#8 envelope.
    */
  def parseRsaPrivateKey(pem: String): PrivateKey = {
    val normalized = normalizePem(pem)
    val isPkcs1 = normalized.contains("BEGIN RSA PRIVATE KEY")
    val body = normalized.linesIterator
      .filterNot(l => l.contains("-----") || l.trim.isEmpty)
      .mkString
    val der = Base64.getMimeDecoder.decode(body)
    val pkcs8 = if (isPkcs1) wrapPkcs1InPkcs8(der) else der
    KeyFactory.getInstance("RSA").generatePrivate(new PKCS8EncodedKeySpec(pkcs8))
  }

  /** Minimal ASN.1: PrivateKeyInfo{version 0, alg rsaEncryption,
    * OCTET STRING <pkcs1>}.
    */
  private def wrapPkcs1InPkcs8(pkcs1: Array[Byte]): Array[Byte] = {
    def lenBytes(n: Int): Array[Byte] =
      if (n < 0x80) Array(n.toByte)
      else if (n < 0x100) Array(0x81.toByte, n.toByte)
      else Array(0x82.toByte, (n >> 8).toByte, (n & 0xff).toByte)
    val algId = Array[Byte](0x30, 0x0d, 0x06, 0x09, 0x2a, 0x86.toByte, 0x48,
      0x86.toByte, 0xf7.toByte, 0x0d, 0x01, 0x01, 0x01, 0x05, 0x00)
    val version = Array[Byte](0x02, 0x01, 0x00)
    val octet = Array[Byte](0x04) ++ lenBytes(pkcs1.length) ++ pkcs1
    val content = version ++ algId ++ octet
    Array[Byte](0x30) ++ lenBytes(content.length) ++ content
  }

  /** RS256 app JWT (main.py:40-61). `now` injectable for tests. */
  def generateAppJwt(
      appId: String,
      privateKeyPem: String,
      now: Long = Instant.now.getEpochSecond): String = {
    val header = """{"alg":"RS256","typ":"JWT"}"""
    val payload = s"""{"iat":${now - 60},"exp":${now + 540},"iss":"$appId"}"""
    val signingInput =
      b64url(header.getBytes(UTF_8)) + "." + b64url(payload.getBytes(UTF_8))
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(parseRsaPrivateKey(privateKeyPem))
    sig.update(signingInput.getBytes(UTF_8))
    signingInput + "." + b64url(sig.sign())
  }

  final case class AccessToken(token: String, expiresAt: Instant)
}

/** Driver-side token manager with the reference's caching policy.
  * Not thread-safe by design: token minting happens on the driver
  * only; executors receive short-lived tokens via task re-broadcast
  * (the per-page `refreshAuth` hook, main.py:213-215).
  */
class GithubTokenManager(
    appId: String,
    privateKeyPem: String,
    apiUrl: String,
    http: GithubHttp,
    clock: () => Instant = () => Instant.now) {

  import com.fasterxml.jackson.databind.ObjectMapper
  private val mapper = new ObjectMapper

  private var repoInstallation = Map.empty[String, Long]
  private var tokens = Map.empty[Long, GithubAuth.AccessToken]

  private def authHeaders(jwt: String): Map[String, String] = Map(
    "Authorization" -> s"Bearer $jwt",
    "Accept" -> "application/vnd.github+json",
    "X-GitHub-Api-Version" -> "2022-11-28")

  def installationId(repo: String): Long =
    repoInstallation.getOrElse(repo, {
      val jwt = GithubAuth.generateAppJwt(appId, privateKeyPem, clock().getEpochSecond)
      val resp = http.get(s"$apiUrl/repos/$repo/installation", authHeaders(jwt))
      if (resp.status != 200)
        throw new RuntimeException(
          s"Failed to get GitHub App installation for $repo: ${resp.status}: ${resp.body}")
      val id = mapper.readTree(resp.body).get("id").asLong
      repoInstallation += repo -> id
      id
    })

  /** Installation token, cached until <60 s of TTL remain. */
  def token(repo: String): String = {
    val id = installationId(repo)
    val now = clock()
    tokens.get(id) match {
      case Some(t) if t.expiresAt.isAfter(now.plusSeconds(60)) => t.token
      case _ =>
        val jwt = GithubAuth.generateAppJwt(appId, privateKeyPem, now.getEpochSecond)
        val resp = http.post(s"$apiUrl/app/installations/$id/access_tokens", authHeaders(jwt))
        if (resp.status != 201)
          throw new RuntimeException(
            s"Failed to get installation access token: ${resp.status}: ${resp.body}")
        val node = mapper.readTree(resp.body)
        val t = GithubAuth.AccessToken(
          node.get("token").asText,
          Instant.parse(node.get("expires_at").asText))
        tokens += id -> t
        t.token
    }
  }
}
