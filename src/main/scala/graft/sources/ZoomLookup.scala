package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-row live HTTP detail lookup with endpoint fallback — the
  * reference's meeting→webinar fallback (S6,
  * src/zoom/extract.py:135-172) as a distributed enrichment operator:
  *
  *  - `mapPartitions`: one transport + per-executor [[TokenManager]]
  *    singleton + one TokenBucket per partition — N keys never mean N
  *    clients, and lookups pace at `ratePerSec` per partition so a
  *    100-executor enrichment respects the API budget;
  *  - the [[HttpRetry]] discipline per request (429/Retry-After
  *    bounded retries, 401 re-grant-once) — shared with
  *    [[PagedFetcher]] so single-GET and pagination behavior cannot
  *    drift;
  *  - the fallback trigger is the reference's exact protocol
  *    (extract.py:153-167): HTTP 400 whose JSON `message` contains
  *    "Can not access webinar info," names a WEBINAR — the fallback id
  *    is parsed from that message (the token after ", ") and the ONE
  *    fallback GET uses the PARSED id, not the original key. The
  *    reference then stamps the webinar payload's uuid back to the
  *    meeting id (extract.py:164) — here the original key is already
  *    the row's `key` column, and the end_time/participants_count
  *    nulling is downstream defaulting (T3, Normalize.withDefault);
  *  - plain 404 is NOT a fallback trigger (extract.py:151-152 only
  *    warns and re-raises): it becomes a NOT_FOUND error row; any
  *    other non-2xx ⇒ taxonomy row — rows, not exceptions: a missing
  *    object is a dead-letter metric, not a dead job (ErrorRouter
  *    taxonomy, error_types.py:4-12);
  *  - URL templates carry a `{key}` placeholder, URL-encoded (the
  *    reference double-encodes uuids with '/' — compose with
  *    [[graft.functions.Normalize]]'s double-encode for that case).
  *
  * Returns rows (key, endpoint primary|fallback|null, status, body,
  * error_type, error_detail); [[split]] separates the channels.
  */
object ZoomLookup {

  final case class LookupRow(
      key: String,
      endpoint: String,   // "primary" | "fallback" | null on error
      status: Int,
      body: String,       // response JSON on success, null on error
      error_type: String, // null on success
      error_detail: String)

  /** Live lookup over `keys(keyCol)`. Templates contain `{key}`. */
  def withFallback(
      keys: DataFrame,
      keyCol: String,
      tokenUrl: String,
      clientId: String,
      clientSecret: String,
      primaryTemplate: String,
      fallbackTemplate: Option[String],
      ratePerSec: Double = 0.0,
      burst: Int = 1): Dataset[LookupRow] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col(keyCol).cast("string")).as[String].mapPartitions { it =>
      val transport = new JdkHttpTransport()
      val tokens = TokenManager.forEndpoint(
        tokenUrl, clientId, clientSecret, transport)
      val limiter = TokenBucket.orUnlimited(ratePerSec, burst)
      it.map { key =>
        if (key == null)
          // null keys exist upstream (S6 keeps null uuids) — a row in
          // the VALIDATION channel, never an executor NPE
          LookupRow(null, null, 0, null, "VALIDATION", "null lookup key")
        else {
          limiter.acquireBlocking()
          val (primary, _) = HttpRetry.get(
            renderUrl(primaryTemplate, key), Map.empty, tokens, transport)
          if (primary.status / 100 == 2)
            LookupRow(key, "primary", primary.status, primary.body, null,
              null)
          else {
            val fallbackId =
              if (primary.status == 400 && fallbackTemplate.isDefined)
                webinarIdFrom(primary.body)
              else None
            fallbackId match {
              case Some(wid) =>
                limiter.acquireBlocking()
                val (fb, _) = HttpRetry.get(
                  renderUrl(fallbackTemplate.get, wid), Map.empty, tokens,
                  transport)
                if (fb.status / 100 == 2)
                  LookupRow(key, "fallback", fb.status, fb.body, null, null)
                else errorRow(key, fb.status, "fallback")
              case None => errorRow(key, primary.status, "primary")
            }
          }
        }
      }
    }
  }

  /** The 400-body marker the API uses when a meeting id is actually a
    * webinar (extract.py:157: `"Can not access webinar info," in
    * _message`). */
  private val WebinarMarker = "Can not access webinar info,"

  /** Shared parser: ObjectMapper construction is heavyweight and
    * instances are thread-safe for readTree (same pattern as OAuth /
    * the source readers). */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse the webinar id out of a 400 response body, mirroring the
    * reference byte-for-byte: `message.split(", ")[1]`
    * (extract.py:158). None when the body is not JSON, has no message,
    * lacks the marker, or has nothing after the first ", " — the
    * caller then dead-letters the original 400. */
  private[sources] def webinarIdFrom(body: String): Option[String] =
    try {
      val node = mapper.readTree(body)
      val msg = Option(node.get("message")).filterNot(_.isNull)
        .map(_.asText()).getOrElse("")
      if (!msg.contains(WebinarMarker)) None
      else {
        val parts = msg.split(", ", -1)
        if (parts.length > 1 && parts(1).nonEmpty) Some(parts(1)) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Path-SEGMENT encoding: URLEncoder is form encoding (space → '+',
    * which servers decode as a literal plus in a path); re-encode the
    * few divergent characters per RFC 3986. */
  private def pathSegment(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")

  private def renderUrl(template: String, key: String): String =
    template.replace("{key}", pathSegment(key))

  /** Dead-letter rows carry the reference's error taxonomy
    * (error_types.py / [[graft.operators.ErrorRouter.ErrorTypes]]) so
    * replay can target the retryable classes: RATE_LIMIT (429 survived
    * the bounded retries) and AUTHENTICATION/AUTHORIZATION are
    * re-runnable; NOT_FOUND is a data fact; UNEXPECTED needs triage. */
  private def errorRow(key: String, status: Int,
      endpoint: String): LookupRow = {
    val errType = status match {
      case 404 => "NOT_FOUND"
      case 429 => "RATE_LIMIT"
      case 401 => "AUTHENTICATION"
      case 403 => "AUTHORIZATION"
      case _ => "UNEXPECTED"
    }
    LookupRow(key, null, status, null, errType,
      s"$key: HTTP $status on $endpoint")
  }

  /** Live 1:N child fetch per key — the reference's per-meeting
    * participants pagination (S7, extract.py: GET
    * /meetings/{uuid}/participants, paged). One [[PagedItems]] drain
    * per key inside one mapPartitions pass; emits (key, body) per
    * child item. Keys whose endpoint 404s yield zero children (a
    * meeting with no participant report), other failures propagate —
    * children of a key are all-or-nothing, matching the reference's
    * loader transaction. */
  def children(
      keys: DataFrame,
      keyCol: String,
      tokenUrl: String,
      clientId: String,
      clientSecret: String,
      urlTemplate: String,
      itemsField: String = "participants",
      pageSize: Int = 300,
      ratePerSec: Double = 0.0,
      burst: Int = 1): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col(keyCol).cast("string")).as[String].mapPartitions { it =>
      val transport = new JdkHttpTransport()
      val tokens = TokenManager.forEndpoint(
        tokenUrl, clientId, clientSecret, transport)
      val limiter = TokenBucket.orUnlimited(ratePerSec, burst)
      it.flatMap { key =>
        if (key == null) Vector.empty // no addressable endpoint — skip
        else {
          val cfg = ZoomApiConfig(renderUrl(urlTemplate, key), tokenUrl,
            clientId, clientSecret, itemsField, pageSize)
          try new PagedItems(cfg, Map.empty, limiter, tokens, transport)
            .map(node => (key, node.toString)).toVector
          catch {
            // 404 = no participant report for this key ⇒ zero children
            // (status carried structurally — a 500, or a "404" embedded
            // in some other message, still fails the task)
            case e: HttpStatusException if e.status == 404 => Vector.empty
          }
        }
      }
    }.toDF("key", "body")
  }

  /** ErrorRouter-shaped split: (enriched, dead-letter). Same
    * one-pass-per-channel contract as Media's splits — persist the
    * lookup result when consuming both channels at scale (each lookup
    * is a real HTTP call, twice as expensive to repeat as a decode). */
  def split(rows: Dataset[LookupRow]): (DataFrame, DataFrame) = {
    val df = rows.toDF()
    (df.where(col("error_type").isNull)
        .select("key", "endpoint", "status", "body"),
      df.where(col("error_type").isNotNull)
        .select("key", "status", "error_type", "error_detail"))
  }
}
