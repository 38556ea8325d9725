package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** Minimal HTTP surface the auth/pagination layer consumes — the ONLY
  * seam a live deployment implements (e.g. over java.net.http). The
  * engine ships no HTTP client: offline tests inject fakes, and the
  * container has no egress. Kept to exactly what the reference's REST
  * contract needs (status, headers, body). */
final case class HttpResponse(
    status: Int,
    headers: Map[String, String],
    body: String) {
  def header(name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
}

/** Pluggable transport: POST for the token grant, GET for API pages. */
trait HttpTransport {
  def post(url: String, headers: Map[String, String]): HttpResponse
  def get(url: String, headers: Map[String, String],
      params: Map[String, String]): HttpResponse
}

/** OAuth client-credentials token manager (S11) — the engine analog of
  * the reference's `TokenManager` (src/zoom/oauth.py:12-51): one cached
  * token per (endpoint, client) pair, refreshed under a lock when
  * absent or past its conservative expiry.
  *
  * Semantics preserved from the reference:
  *  - Basic auth = base64("clientId:clientSecret") on the token POST
  *    (oauth.py:23-31);
  *  - `access_token` parsed from the JSON response (oauth.py:35-36);
  *  - expiry pinned at now + 55 min — a 5-minute buffer under the
  *    60-minute token, so a token never dies mid-request
  *    (oauth.py:37-38);
  *  - refresh-on-demand under a lock: concurrent readers block on one
  *    refresh instead of stampeding the endpoint (oauth.py:45-50).
  *
  * Engine-side additions: an injectable clock (deterministic specs), a
  * non-2xx grant is an error (the reference re-raises too), and
  * [[invalidate]] for the 401 path — a live reader that gets 401 drops
  * the cached token and retries once, which the reference cannot do
  * (its pagination loop hard-fails on auth expiry mid-run).
  *
  * On a cluster this object lives per-executor (see [[TokenManager
  * .forEndpoint]]): every partition reader on the executor shares one
  * token and one refresh lock — 1000 tasks do not mean 1000 grants.
  */
final class TokenManager(
    tokenEndpoint: String,
    clientId: String,
    clientSecret: String,
    transport: HttpTransport,
    clock: () => Long = System.currentTimeMillis _,
    ttlMs: Long = TokenManager.DefaultTtlMs) {

  private[this] var token: String = _
  private[this] var expiryMs: Long = Long.MinValue
  private[this] var grants: Long = 0L
  private val mapper = new ObjectMapper()

  private def basicAuth: String = {
    val key = s"$clientId:$clientSecret"
    val enc = java.util.Base64.getEncoder
      .encodeToString(key.getBytes("UTF-8"))
    s"Basic $enc"
  }

  /** Current valid token, refreshing if absent/expired (oauth.py:45-50). */
  def getToken(): String = synchronized {
    if (token == null || clock() >= expiryMs) refresh()
    token
  }

  /** Drop the cached token (401 recovery) — next getToken re-grants. */
  def invalidate(): Unit = synchronized { token = null }

  /** Total grant requests issued (observability + spec assertions). */
  def grantCount: Long = synchronized(grants)

  private def refresh(): Unit = {
    val resp = transport.post(tokenEndpoint,
      Map("Authorization" -> basicAuth))
    grants += 1
    if (resp.status / 100 != 2)
      throw new java.io.IOException(
        s"token grant failed: HTTP ${resp.status} from $tokenEndpoint")
    val node = mapper.readTree(resp.body)
    val at = node.get("access_token")
    if (at == null || at.isNull)
      throw new java.io.IOException(
        s"token grant response has no access_token field")
    token = at.asText()
    expiryMs = clock() + ttlMs
  }
}

object TokenManager {
  /** 55 min = 60-minute Zoom token minus the reference's 5-minute
    * safety buffer (oauth.py:37). */
  val DefaultTtlMs: Long = 55L * 60 * 1000

  private val instances =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String),
      TokenManager]

  /** Executor-singleton accessor: one manager per (endpoint, clientId,
    * secret-hash) per JVM, however many partition readers ask. The
    * secret participates in the key as a SHA-256 digest (never stored
    * in clear), so a credential rotation under the same clientId picks
    * up a fresh manager instead of silently reusing stale credentials
    * until JVM restart. Live readers resolve their manager here from
    * read options inside `createReader`. */
  def forEndpoint(
      tokenEndpoint: String,
      clientId: String,
      clientSecret: String,
      transport: HttpTransport): TokenManager = {
    val secretHash = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(clientSecret.getBytes("UTF-8")))
    instances.computeIfAbsent((tokenEndpoint, clientId, secretHash),
      _ => new TokenManager(tokenEndpoint, clientId, clientSecret, transport))
  }
}

/** Paginated REST fetch loop (S1's live contract) — the engine analog
  * of `_make_paginated_request` (src/zoom/extract.py:27-48):
  *
  *  - Bearer-auth GET per page (extract.py:52-55);
  *  - 429 ⇒ sleep `Retry-After` seconds (default 60) and retry the
  *    SAME request (extract.py:33-37);
  *  - follow `next_page_token` until the response omits it
  *    (extract.py:42-44);
  *  - any other non-2xx raises (extract.py:38,45-47).
  *
  * Engine-side hardening over the reference:
  *  - 401 invalidates the token manager and retries ONCE with a fresh
  *    grant (the reference dies if the token expires mid-pagination);
  *  - retries are BOUNDED (`maxAttempts`, the reference 429-loops
  *    forever) and `Retry-After` is capped (`maxRetryAfterMs`) so a
  *    hostile header cannot park an executor core for hours;
  *  - the sleeper is injectable — specs assert pacing without wall
  *    clock; partition readers pass Thread.sleep.
  *
  * Returns a lazy Iterator of parsed page bodies: the reader pulls
  * pages only as Spark consumes rows, so a LIMIT stops fetching.
  */
object PagedFetcher {
  private val mapper = new ObjectMapper()

  def pages(
      url: String,
      params: Map[String, String],
      tokens: TokenManager,
      transport: HttpTransport,
      sleeper: Long => Unit = ms => Thread.sleep(ms),
      maxAttempts: Int = 8,
      maxRetryAfterMs: Long = 5L * 60 * 1000)
      : Iterator[com.fasterxml.jackson.databind.JsonNode] =
    new Iterator[com.fasterxml.jackson.databind.JsonNode] {
      private var nextToken: Option[String] = None
      private var done = false

      override def hasNext: Boolean = !done

      override def next(): com.fasterxml.jackson.databind.JsonNode = {
        if (done) throw new NoSuchElementException("pagination exhausted")
        val p = nextToken.fold(params)(t => params + ("next_page_token" -> t))
        val body = fetchWithRetry(p)
        val node = mapper.readTree(body)
        val npt = Option(node.get("next_page_token"))
          .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
        nextToken = npt
        done = npt.isEmpty
        node
      }

      private def fetchWithRetry(p: Map[String, String]): String = {
        val (resp, attempt) = HttpRetry.get(url, p, tokens, transport,
          sleeper, maxAttempts, maxRetryAfterMs)
        if (resp.status / 100 == 2) resp.body
        else throw new HttpStatusException(resp.status, url, attempt)
      }
    }
}

/** Non-2xx terminal response from the retry loop, with the status
  * carried STRUCTURALLY — callers branch on `status` (e.g. 404 ⇒
  * webinar fallback / zero children), never by parsing the message.
  * Still an IOException so existing propagation contracts hold. */
final class HttpStatusException(
    val status: Int, url: String, attempt: Int)
    extends java.io.IOException(
      s"API request failed for $url: HTTP $status (attempt $attempt)")

/** The shared Bearer-GET retry discipline (extract.py:33-48), factored
  * so single-object lookups ([[ZoomLookup]]) and pagination
  * ([[PagedFetcher]]) cannot drift apart:
  *  - 429 ⇒ sleep `Retry-After` (default 60 s, capped) and retry the
  *    SAME request, at most `maxAttempts` times;
  *  - 401 ⇒ invalidate the token manager and retry ONCE with a fresh
  *    grant;
  *  - everything else (including 400/404) returns to the CALLER — a
  *    lookup sniffs a 400 body for the webinar-fallback marker
  *    (extract.py:153-160), a paginator treats any non-2xx as a hard
  *    error. */
private[sources] object HttpRetry {
  /** Returns (final response, attempts made). Never throws on HTTP
    * status — transport-level failures (connect/timeouts) propagate. */
  def get(
      url: String,
      params: Map[String, String],
      tokens: TokenManager,
      transport: HttpTransport,
      sleeper: Long => Unit = ms => Thread.sleep(ms),
      maxAttempts: Int = 8,
      maxRetryAfterMs: Long = 5L * 60 * 1000): (HttpResponse, Int) = {
    var attempt = 0
    var retried401 = false
    while (true) {
      attempt += 1
      val resp = transport.get(url,
        Map("Authorization" -> s"Bearer ${tokens.getToken()}",
          "Content-Type" -> "application/json"), params)
      resp.status match {
        case 429 if attempt < maxAttempts =>
          val retryMs = resp.header("Retry-After")
            .flatMap(v => scala.util.Try(v.toLong).toOption)
            .getOrElse(60L) * 1000L
          sleeper(math.min(math.max(retryMs, 0L), maxRetryAfterMs))
        case 401 if !retried401 =>
          retried401 = true
          tokens.invalidate()
        case _ => return (resp, attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
