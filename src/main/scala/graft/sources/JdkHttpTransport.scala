package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest}
import java.net.http.{HttpResponse => JHttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.jdk.CollectionConverters._

/** REAL [[HttpTransport]] over the JDK 11+ `java.net.http.HttpClient` —
  * the live implementation of the transport seam (no external HTTP
  * dependency; the engine stays stdlib-only). Used by the live-API mode
  * of [[ZoomMeetingSource]] and directly testable against a loopback
  * `com.sun.net.httpserver` (see LoopbackHttpSpec).
  *
  * Serializable so it can ride inside a reader factory; the client is
  * `@transient lazy` and is rebuilt executor-side after deserialization.
  * One client per transport instance; partition readers each build one,
  * which matches HttpClient's intended one-per-component usage (it
  * pools connections internally).
  */
final class JdkHttpTransport(
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 30000L) extends HttpTransport with Serializable {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  private def run(b: HttpRequest.Builder,
      headers: Map[String, String]): HttpResponse = {
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(
      b.timeout(Duration.ofMillis(requestTimeoutMs)).build(),
      JHttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    val hs = resp.headers().map().asScala
      .map { case (k, vs) => k -> vs.asScala.mkString(",") }.toMap
    HttpResponse(resp.statusCode(), hs, resp.body())
  }

  /** Token-grant POST (client-credentials): form body, Basic auth comes
    * in via `headers`. Callers may override Content-Type. */
  override def post(url: String, headers: Map[String, String]): HttpResponse = {
    val withCt =
      if (headers.keys.exists(_.equalsIgnoreCase("Content-Type"))) headers
      else headers + ("Content-Type" -> "application/x-www-form-urlencoded")
    run(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString("grant_type=client_credentials")),
      withCt)
  }

  override def get(url: String, headers: Map[String, String],
      params: Map[String, String]): HttpResponse = {
    val qs = params.toSeq.sortBy(_._1).map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val full =
      if (qs.isEmpty) url
      else if (url.contains("?")) s"$url&$qs"
      else s"$url?$qs"
    run(HttpRequest.newBuilder(URI.create(full)).GET(), headers)
  }
}
