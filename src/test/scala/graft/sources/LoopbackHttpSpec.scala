package graft.sources

import java.io.OutputStream
import java.net.{InetAddress, InetSocketAddress, URLDecoder}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end live-HTTP proof for S1 (paginated REST scan) + S11
  * (OAuth): a real `com.sun.net.httpserver` loopback serves a Zoom-shaped
  * token endpoint and a paginated meetings endpoint with injected
  * 429-then-Retry-After and 401-after-token-expiry faults, and the specs
  * drive [[TokenManager]], [[PagedFetcher]] and the live DSv2 mode of
  * [[ZoomMeetingSource]] against it over a REAL socket — no fakes
  * anywhere in the transport path ([[JdkHttpTransport]] end to end).
  * Mirrors src/zoom/oauth.py:21-61 and src/zoom/extract.py:27-47.
  */
class LoopbackHttpSpec extends SparkSpec {

  private val clientId = "graft-client"
  private val clientSecret = "graft-secret"

  /** (id, uuid, topic, start_time) — 2 meetings/day over 3 UTC days,
    * plus one at EXACTLY midnight (107): the boundary shared by two
    * adjacent day slices. An inclusive-from/to API (this server)
    * returns it to both slices — the reader's half-open slice residual
    * must emit it exactly once, and the exact-equality assertions
    * below are the duplicate-row regression test. 108 starts at a
    * SUB-SECOND offset in the first second of a UTC day: it sorts
    * lexicographically BEFORE the day-boundary string ('.' < 'Z'), so
    * a string-comparing slice residual silently drops it — the reader
    * must place it numerically (epoch ms). */
  private val meetings: Seq[(Long, String, String, String)] =
    (for {
      (day, d) <- Seq("2024-01-10", "2024-01-11", "2024-01-12").zipWithIndex
      (hour, h) <- Seq("09", "15").zipWithIndex
    } yield {
      val id = 101L + d * 2 + h
      (id, s"u$id", s"Mtg $id", s"${day}T$hour:00:00Z")
    }) :+ ((107L, "u107", "Mtg 107", "2024-01-11T00:00:00Z")) :+
      ((108L, "u108", "Mtg 108", "2024-01-11T00:00:00.500Z"))

  /** Meetings appended mid-test (the streaming spec grows the corpus
    * between micro-batches); served alongside the fixed list. Their
    * start_times must be NEAR WALL-NOW: the stream's offset advances
    * to `now` per data-bearing batch (the reference's bookmark-to-now
    * loop), so an item appearing later with a start_time before the
    * committed offset is a late arrival the source does not re-scan. */
  private val extraMeetings =
    new ConcurrentLinkedQueue[(Long, String, String, String)]()

  /** ISO instant just before wall-now: strictly after any committed
    * offset from an earlier batch, strictly before the next probe's
    * `now` — the window where a newly-appearing item is admitted. */
  private def justBeforeNowIso(): String =
    java.time.Instant.ofEpochMilli(System.currentTimeMillis() - 1).toString

  // --- server state -------------------------------------------------
  private val grantCount = new AtomicInteger(0)
  /** All unexpired grants stay valid (real OAuth semantics — a new grant
    * does not revoke older tokens); the expiry fault clears the set. */
  private val validTokens =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val lastBasicAuth = new AtomicReference[String]("")
  private val serve429Once = new AtomicBoolean(false)
  private val expireTokenOnce = new AtomicBoolean(false)
  /** (path, status) log of every exchange, in arrival order. */
  private val statuses = new ConcurrentLinkedQueue[(String, Int)]()
  private val seenFromParams = new ConcurrentLinkedQueue[String]()
  /** Meeting items actually serialized onto the wire — the
    * double-fetch regression counter. */
  private val itemsServed = new AtomicInteger(0)

  private def respond(ex: HttpExchange, status: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes("UTF-8")
    statuses.add((ex.getRequestURI.getPath, status))
    ex.sendResponseHeaders(status, bytes.length)
    val os: OutputStream = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def lastSegment(ex: HttpExchange): String = {
    val p = ex.getRequestURI.getPath
    p.substring(p.lastIndexOf('/') + 1)
  }

  private def authed(ex: HttpExchange): Boolean = {
    val bearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .getOrElse("").stripPrefix("Bearer ")
    bearer.nonEmpty && validTokens.contains(bearer)
  }

  /** The one offset-token pagination implementation every paginated
    * endpoint shares (was three copies). */
  private def pageJson(itemsJson: Seq[String], p: Map[String, String],
      field: String, counter: Option[AtomicInteger] = None): String = {
    val pageSize = p.getOrElse("page_size", "300").toInt
    val offset = p.get("next_page_token").map(_.toInt).getOrElse(0)
    val page = itemsJson.slice(offset, offset + pageSize)
    counter.foreach(_.addAndGet(page.size))
    val npt =
      if (offset + pageSize < itemsJson.size) (offset + pageSize).toString
      else ""
    s"""{"page_size":$pageSize,"next_page_token":"$npt",""" +
      s""""$field":[${page.mkString(",")}]}"""
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)

    s.createContext("/oauth/token", (ex: HttpExchange) => {
      lastBasicAuth.set(
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      val expected = "Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$clientId:$clientSecret".getBytes("UTF-8"))
      if (lastBasicAuth.get != expected)
        respond(ex, 401, """{"error":"bad_client"}""")
      else {
        val tok = s"tok-${grantCount.incrementAndGet()}"
        validTokens.add(tok)
        respond(ex, 200,
          s"""{"access_token":"$tok","token_type":"bearer","expires_in":3600}""")
      }
    })

    s.createContext("/v2/meetings", (ex: HttpExchange) => {
      val p = queryParams(ex)
      p.get("from").foreach(seenFromParams.add)
      if (expireTokenOnce.getAndSet(false)) {
        validTokens.clear() // server-side token expiry: re-grant required
        respond(ex, 401, """{"error":"token expired"}""")
      } else if (!authed(ex))
        respond(ex, 401, """{"error":"invalid token"}""")
      else if (serve429Once.getAndSet(false))
        respond(ex, 429, """{"error":"rate limited"}""",
          Map("Retry-After" -> "1"))
      else {
        // a real API PARSES from/to (it does not string-compare), so
        // the window check here is numeric: a sub-second item in the
        // first second of a day belongs to THAT day's window only
        val fromMs = p.get("from").flatMap(ZoomRows.epochMsOf)
          .getOrElse(Long.MinValue)
        val toMs = p.get("to").flatMap(ZoomRows.epochMsOf)
          .getOrElse(Long.MaxValue)
        val inWindow = (meetings ++ extraMeetings.asScala)
          .filter(m => ZoomRows.epochMsOf(m._4)
            .exists(ms => ms >= fromMs && ms <= toMs))
          .map { case (id, uuid, topic, st) =>
            s"""{"id":$id,"uuid":"$uuid","host_id":"h1",""" +
              s""""topic":"$topic","start_time":"$st",""" +
              s""""end_time":"${st.replace(":00:00Z", ":30:00Z")}",""" +
              s""""duration":30,"participants_count":5,"type":2}"""
          }
        respond(ex, 200, pageJson(inWindow, p, "meetings",
          Some(itemsServed)))
      }
    })

    // per-object detail endpoints for the S6 lookup-with-fallback,
    // reproducing the reference protocol (extract.py:150-167): meetings
    // exist for EVEN ids; odd ids divisible by 3 are webinars and the
    // MEETING endpoint answers 400 with "Can not access webinar info,
    // w{id}" — the fallback must parse the webinar id (w3, NOT the
    // original key 3) out of that message; everything else is 404
    s.createContext("/v2/meeting_detail/", (ex: HttpExchange) => {
      val id = lastSegment(ex)
      if (!authed(ex)) respond(ex, 401, """{"error":"invalid token"}""")
      else if (id.toLongOption.exists(_ % 2 == 0))
        respond(ex, 200,
          s"""{"id":$id,"uuid":"u$id","topic":"Mtg $id","type":2}""")
      else if (id.toLongOption.exists(i => i % 2 == 1 && i % 3 == 0))
        respond(ex, 400,
          s"""{"code":3001,"message":"Can not access webinar info, w$id"}""")
      else respond(ex, 404, """{"error":"meeting not found"}""")
    })
    s.createContext("/v2/webinar_detail/", (ex: HttpExchange) => {
      val id = lastSegment(ex) // webinar ids carry the "w" prefix
      if (!authed(ex)) respond(ex, 401, """{"error":"invalid token"}""")
      else if (id.startsWith("w") && id.drop(1).toLongOption
          .exists(i => i % 2 == 1 && i % 3 == 0))
        respond(ex, 200,
          s"""{"id":"$id","uuid":"$id","topic":"Web $id","type":5}""")
      else respond(ex, 404, """{"error":"webinar not found"}""")
    })

    // 1:N participants per meeting (S7): 3 children for even ids,
    // paginated by page_size; 404 for odd ids (no participant report)
    s.createContext("/v2/meeting_participants/", (ex: HttpExchange) => {
      val id = lastSegment(ex)
      if (!authed(ex)) respond(ex, 401, """{"error":"invalid token"}""")
      else if (id.toLongOption.exists(_ % 2 == 0)) {
        val all = (1 to 3).map(i =>
          s"""{"id":"p${id}_$i","user_email":"p$i@x.test","duration":$i}""")
        respond(ex, 200, pageJson(all, queryParams(ex), "participants"))
      } else respond(ex, 404, """{"error":"no participant report"}""")
    })

    s.setExecutor(Executors.newFixedThreadPool(8))
    s.start()
    s
  }

  private def base: String = {
    val port = server.getAddress.getPort
    s"http://127.0.0.1:$port"
  }

  override def afterAll(): Unit = server.stop(0)

  test("TokenManager grants, caches and rotates over a real socket") {
    val tm = new TokenManager(s"$base/oauth/token", clientId, clientSecret,
      new JdkHttpTransport())
    val before = grantCount.get
    val t1 = tm.getToken()
    assert(t1 === s"tok-${before + 1}")
    assert(tm.getToken() === t1) // cached, no second grant
    assert(tm.grantCount === 1)
    assert(lastBasicAuth.get.startsWith("Basic "))
    tm.invalidate()
    val t2 = tm.getToken()
    assert(t2 !== t1)
    assert(tm.grantCount === 2)
  }

  test("token grant with wrong credentials fails loudly over the socket") {
    val bad = new TokenManager(s"$base/oauth/token", clientId, "wrong",
      new JdkHttpTransport())
    val e = intercept[java.io.IOException](bad.getToken())
    assert(e.getMessage.contains("401"))
  }

  test("PagedFetcher: pagination + 429 Retry-After + 401 re-grant, " +
      "real socket") {
    val transport = new JdkHttpTransport()
    val tm = new TokenManager(s"$base/oauth/token", clientId, clientSecret,
      transport)
    serve429Once.set(true)
    expireTokenOnce.set(true)
    statuses.clear()
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val grantsBefore = tm.grantCount
    val pages = PagedFetcher.pages(s"$base/v2/meetings",
      Map("page_size" -> "2"), tm, transport,
      sleeper = ms => sleeps += ms).toList // recording sleeper: no wall wait
    val ids = pages.flatMap(_.get("meetings").elements().asScala
      .map(_.get("id").asLong()))
    assert(ids.sorted === meetings.map(_._1).sorted) // all 7, 4 pages
    assert(pages.size === 4)
    assert(sleeps.toSeq === Seq(1000L)) // one 429, Retry-After: 1 honored
    assert(tm.grantCount === grantsBefore + 2) // initial + post-401 re-grant
    val meetingStatuses = statuses.asScala.collect {
      case ("/v2/meetings", st) => st }.toSeq
    assert(meetingStatuses.count(_ == 429) === 1)
    assert(meetingStatuses.count(_ == 401) === 1)
    assert(meetingStatuses.count(_ == 200) === 4)
  }

  test("live DSv2 scan: date-sliced partitions, pushdown, pruning and " +
      "fault recovery end-to-end over a real socket") {
    serve429Once.set(true)
    expireTokenOnce.set(true)
    statuses.clear()
    seenFromParams.clear()
    val df = spark.read.format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "2")
      .load()
      .where(col("start_time") >= "2024-01-10T00:00:00Z" &&
        col("start_time") <= "2024-01-12T23:59:59Z")
      .select("id", "topic", "start_time")

    // the closed pushed window becomes one partition per UTC day (S4)
    assert(df.rdd.getNumPartitions === 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("mode=live"))
    assert(plan.contains("start_time")) // pushed filter surfaced in scan

    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === meetings.map(_._1))
    assert(rows.map(_.getString(1)).toSeq === meetings.map(_._3))
    assert(rows.head.schema.fieldNames.toSeq ===
      Seq("id", "topic", "start_time")) // pruned projection

    // each day-partition sent its own from param; faults were consumed
    assert(seenFromParams.asScala.toSet.size === 3)
    val sts = statuses.asScala.collect { case ("/v2/meetings", st) => st }
    assert(sts.count(_ == 429) === 1 && sts.exists(_ == 401))
    assert(!serve429Once.get && !expireTokenOnce.get)
  }

  test("live scan paces page fetches through the token bucket") {
    // 8 meetings / page_size 2 = 4 page fetches in ONE partition (no
    // pushed window); ratePerSec=10, burst=1 ⇒ fetch 1 rides the burst
    // token, fetches 2-4 each wait ~100 ms. Lower bound only — no
    // upper bound, so scheduler jitter cannot flake the test.
    val df = spark.read.format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "2")
      .option("ratePerSec", "10")
      .option("burst", "1")
      .load()
    assert(df.rdd.getNumPartitions === 1) // serial pagination, no window
    val t0 = System.nanoTime()
    assert(df.count() === 8)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 150.0, s"unpaced: $elapsedMs ms for 4 page fetches")
  }

  test("live micro-batch stream: checkpointed incremental windows, " +
      "exactly-once across batches over a real socket") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_out").toString
    // parquet sink (not memory): fault-tolerant, so the restart half of
    // this test can recover from the same checkpoint
    def startQuery() = spark.readStream
      .format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "3")
      .option("startTime", "2024-01-01T00:00:00Z")
      .load()
      .select("id", "start_time")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    def sinkIds(): Seq[Long] = spark.read.parquet(outDir)
      .collect().map(_.getLong(0)).sorted.toSeq

    val q = startQuery()
    try {
      q.processAllAvailable() // terminates: offset only advances on data
      assert(sinkIds() === meetings.map(_._1).sorted)
      // the corpus grows between micro-batches — the bookmark offset
      // must pick up ONLY the new window, exactly once (start_times
      // near wall-now: the offset is a bookmark-to-now high-water mark)
      extraMeetings.add((201L, "u201", "Mtg 201", justBeforeNowIso()))
      extraMeetings.add((202L, "u202", "Mtg 202", justBeforeNowIso()))
      q.processAllAvailable()
      assert(sinkIds() === (meetings.map(_._1) ++ Seq(201L, 202L)).sorted)

      // RESTART from the same checkpoint: the committed bookmark must
      // survive — nothing replays, and post-restart data arrives once
      q.stop()
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        extraMeetings.add((203L, "u203", "Mtg 203", justBeforeNowIso()))
        q2.processAllAvailable()
        // global exactly-once: every id appears EXACTLY once across the
        // whole run, including across the restart boundary
        assert(sinkIds() ===
          (meetings.map(_._1) ++ Seq(201L, 202L, 203L)).sorted)
      } finally q2.stop()
    } finally {
      q.stop()
      extraMeetings.clear()
    }
  }

  test("live micro-batch stream fetches each data page exactly once " +
      "(driver probe is existence-only: at most one page on the wire)") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_once_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_once_out").toString
    itemsServed.set(0)
    val q = spark.readStream.format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "3")
      .option("startTime", "2024-01-01T00:00:00Z")
      .load()
      .select("id", "start_time")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(outDir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === meetings.map(_._1).sorted)
      // every meeting crossed the wire exactly ONCE (the reader's
      // window fetch: pages of 3+3+2) plus AT MOST ONE page (3 items
      // at this pageSize) for the driver's existence probe; idle
      // probes carry zero items. The old double-fetch design moved
      // 2n + a probe here.
      assert(itemsServed.get === meetings.size + 3,
        s"wire carried ${itemsServed.get} items for " +
          s"${meetings.size} meetings — data pages must cross once, " +
          "probe at most one page")
    } finally q.stop()
  }

  test("visibilityLagMs holds the offset behind the clock so " +
      "late-visible items are admitted, not lost") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_lag_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_lag_out").toString
    def startQuery(lagMs: Long) = spark.readStream
      .format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "3")
      .option("startTime", "2024-01-01T00:00:00Z")
      .option("visibilityLagMs", lagMs.toString)
      .load()
      .select("id", "start_time")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    def sinkIds(): Seq[Long] = spark.read.parquet(outDir)
      .collect().map(_.getLong(0)).sorted.toSeq
    val q = startQuery(10L * 60 * 1000) // 10-minute visibility lag
    try {
      q.processAllAvailable()
      // historical fixtures are far older than the lag: all delivered
      assert(sinkIds() === meetings.map(_._1).sorted)
      // an item whose start_time is INSIDE the lag window: the offset
      // must not pass it — a meeting-report API might not list it yet
      extraMeetings.add((301L, "u301", "Mtg 301", justBeforeNowIso()))
      q.processAllAvailable()
      assert(!sinkIds().contains(301L),
        "item inside the visibility-lag window must not be admitted yet")
    } finally q.stop()
    // restart from the SAME checkpoint without the lag: the item's
    // start_time is ahead of the committed offset, so it arrives now —
    // the lag held the offset back instead of losing the item
    val q2 = startQuery(0)
    try {
      q2.processAllAvailable()
      assert(sinkIds() === (meetings.map(_._1) :+ 301L).sorted)
    } finally {
      q2.stop()
      extraMeetings.clear()
    }
  }

  test("limit pushdown stops page fetching (LIMIT 3 fetches 2 pages, " +
      "not 4)") {
    statuses.clear()
    val df = spark.read.format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "2")
      .load()
      .limit(3)
    assert(df.queryExecution.executedPlan.toString.contains("limit=3"))
    assert(df.collect().length === 3)
    val fetched = statuses.asScala.count {
      case ("/v2/meetings", 200) => true; case _ => false }
    assert(fetched <= 2, s"LIMIT 3 should stop after 2 pages, saw $fetched")
  }

  test("live micro-batch stream: admission control caps the backfill " +
      "window per batch") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ac_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ac_out").toString
    val q = spark.readStream.format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .option("pageSize", "3")
      // 9 days BEFORE any data: the first capped window is empty and the
      // gap-resume probe must jump the offset to where data starts
      // instead of grinding through 9 empty one-day batches
      .option("startTime", "2024-01-01T00:00:00Z")
      .option("maxWindowPerBatchMs", (24L * 3600 * 1000).toString) // 1 day
      .load()
      .select("id", "start_time")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // completeness: the whole 3-day backfill arrives...
      val ids = spark.read.parquet(outDir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === meetings.map(_._1).sorted)
      // ...but split across >= 2 bounded micro-batches, not one big one
      val rowBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(rowBatches >= 2,
        s"1-day cap over 3 days should take >= 2 batches, saw $rowBatches")
    } finally q.stop()
  }

  test("live per-key lookup with webinar fallback over a real socket " +
      "(S6: 400 + message names the webinar id, plain 404 -> dead letter)") {
    statuses.clear()
    val keys = spark.range(1, 7).toDF("id") // 1..6
    val rows = ZoomLookup.withFallback(keys, "id",
      s"$base/oauth/token", clientId, clientSecret,
      s"$base/v2/meeting_detail/{key}",
      Some(s"$base/v2/webinar_detail/{key}"))
    val (ok, dead) = ZoomLookup.split(rows)
    val byKey = ok.collect().map(r =>
      r.getAs[String]("key") -> r).toMap
    // even ids resolve on the primary endpoint
    Seq("2", "4", "6").foreach { k =>
      assert(byKey(k).getAs[String]("endpoint") === "primary")
      assert(byKey(k).getAs[String]("body").contains("\"type\":2"))
    }
    // 3 is a webinar: the meeting endpoint answers 400 with
    // "Can not access webinar info, w3" and the fallback GET must use
    // the PARSED id w3 — the original key 3 404s on the webinar
    // endpoint, so success proves the message-sniff protocol
    assert(byKey("3").getAs[String]("endpoint") === "fallback")
    assert(byKey("3").getAs[String]("body").contains("\"type\":5"))
    assert(byKey("3").getAs[String]("body").contains("w3"))
    assert(byKey.keySet === Set("2", "3", "4", "6"))
    assert(statuses.asScala.exists {
      case (p, st) => p.endsWith("/webinar_detail/w3") && st == 200
      case _ => false
    }, "fallback GET must hit the id parsed from the 400 message")
    // plain 404 (1, 5) is NOT a fallback trigger: the reference only
    // sniffs 400 bodies — these dead-letter directly, job survives
    val deadRows = dead.collect().map(r =>
      r.getAs[String]("key") -> r.getAs[String]("error_type")).toMap
    assert(deadRows === Map("1" -> "NOT_FOUND", "5" -> "NOT_FOUND"))
    assert(!statuses.asScala.exists {
      case (p, _) => p.endsWith("/webinar_detail/1") ||
        p.endsWith("/webinar_detail/5")
      case _ => false
    }, "plain 404 must not attempt the fallback endpoint")
  }

  test("webinarIdFrom mirrors the reference's message parse exactly") {
    assert(ZoomLookup.webinarIdFrom(
      """{"code":3001,"message":"Can not access webinar info, 987654"}""")
      === Some("987654"))
    // split(", ")[1] keeps only the token between the first and second
    // ", " — same as the reference
    assert(ZoomLookup.webinarIdFrom(
      """{"message":"Can not access webinar info, 42, extra"}""")
      === Some("42"))
    assert(ZoomLookup.webinarIdFrom(
      """{"message":"some other 400"}""") === None)
    assert(ZoomLookup.webinarIdFrom(
      """{"message":"Can not access webinar info,"}""") === None)
    assert(ZoomLookup.webinarIdFrom("not json") === None)
    assert(ZoomLookup.webinarIdFrom("""{"code":3001}""") === None)
  }

  test("live 1:N child fetch paginates per key over a real socket " +
      "(S7 participants: 404 = zero children, not a dead job)") {
    val keys = spark.range(1, 5).toDF("id") // 1..4; odd ids have no report
    val kids = ZoomLookup.children(keys, "id",
      s"$base/oauth/token", clientId, clientSecret,
      s"$base/v2/meeting_participants/{key}", pageSize = 2)
    val rows = kids.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.map(_._1).toSet === Set("2", "4")) // odd keys: no children
    assert(rows.count(_._1 == "2") === 3) // paged as 2 + 1
    assert(rows.count(_._1 == "4") === 3)
    assert(rows.filter(_._1 == "2").forall(_._2.contains("\"p2_")))
  }

  test("maxWindowPerBatchMs <= 0 is rejected loudly, not a frozen stream") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.ZoomMeetingSource")
        .option("apiUrl", s"$base/v2/meetings")
        .option("tokenUrl", s"$base/oauth/token")
        .option("clientId", clientId)
        .option("clientSecret", clientSecret)
        .option("maxWindowPerBatchMs", "0")
        .load()
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("maxWindowPerBatchMs")), e.toString)
  }

  test("epochMsOf: lenient ISO parsing (Z, zone offsets, garbage)") {
    assert(ZoomRows.epochMsOf("2024-01-10T09:00:00Z") ===
      Some(1704877200000L))
    // +01:00 form = one hour earlier in UTC
    assert(ZoomRows.epochMsOf("2024-01-10T09:00:00+01:00") ===
      Some(1704877200000L - 3600000L))
    assert(ZoomRows.epochMsOf("2024-01-10T09:00:00.500Z") ===
      Some(1704877200500L))
    assert(ZoomRows.epochMsOf(null) === None)
    assert(ZoomRows.epochMsOf("not a timestamp") === None)
  }

  test("live DSv2 scan: residual time-of-day predicate is enforced " +
      "reader-side on top of day-granular slices") {
    val df = spark.read.format("graft.sources.ZoomMeetingSource")
      .option("apiUrl", s"$base/v2/meetings")
      .option("tokenUrl", s"$base/oauth/token")
      .option("clientId", clientId)
      .option("clientSecret", clientSecret)
      .load()
      .where(col("start_time") >= "2024-01-10T12:00:00Z" &&
        col("start_time") <= "2024-01-11T12:00:00Z")
      .select("id", "start_time")
    // morning meeting of day 1 (09:00 < 12:00) and afternoon of day 2
    // (15:00 > 12:00) are excluded by the residual row filter; the
    // midnight meeting (107) is in-window and appears exactly once;
    // the sub-second meeting (108, 00:00:00.500Z) lands in day 2's
    // slice and must NOT be dropped by a lexicographic boundary check
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(102L, 103L, 107L, 108L))
  }

  test("live mode without auth options fails loudly at scan build, " +
      "not with an executor-side NPE") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.ZoomMeetingSource")
        .option("apiUrl", s"$base/v2/meetings")
        // tokenUrl / clientId / clientSecret deliberately missing
        .load()
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("requires the 'tokenUrl' read option")),
      e.toString)
  }
}
