package graft.sources

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic specs for the S11 auth + pagination contract: a fake
  * transport scripts HTTP responses, a fake clock drives expiry, a fake
  * sleeper records 429 pacing. No network, no wall-clock. */
class OAuthSpec extends AnyFunSuite {

  /** Scripted transport: pops one response per call, records requests. */
  private class FakeTransport(script: HttpResponse*) extends HttpTransport {
    val posts = mutable.Buffer.empty[(String, Map[String, String])]
    val gets = mutable.Buffer.empty[(String, Map[String, String], Map[String, String])]
    private val q = mutable.Queue(script: _*)
    private def pop(): HttpResponse =
      if (q.nonEmpty) q.dequeue()
      else HttpResponse(200, Map.empty, """{"access_token":"tok"}""")
    override def post(url: String, headers: Map[String, String]): HttpResponse = {
      posts += ((url, headers)); pop()
    }
    override def get(url: String, headers: Map[String, String],
        params: Map[String, String]): HttpResponse = {
      gets += ((url, headers, params)); pop()
    }
  }

  private def grant(token: String): HttpResponse =
    HttpResponse(200, Map.empty, s"""{"access_token":"$token"}""")

  test("token is granted once, cached, and sent as Basic auth") {
    val tr = new FakeTransport(grant("t1"))
    val tm = new TokenManager("https://auth/token", "cid", "secret", tr,
      clock = () => 1000L)
    assert(tm.getToken() === "t1")
    assert(tm.getToken() === "t1")
    assert(tr.posts.size === 1) // cached — one grant for two gets
    val expected = "Basic " + java.util.Base64.getEncoder
      .encodeToString("cid:secret".getBytes("UTF-8"))
    assert(tr.posts.head._2("Authorization") === expected)
  }

  test("token refreshes at the 55-minute expiry, not before") {
    var now = 0L
    val tr = new FakeTransport(grant("t1"), grant("t2"))
    val tm = new TokenManager("e", "c", "s", tr, clock = () => now)
    assert(tm.getToken() === "t1")
    now = TokenManager.DefaultTtlMs - 1 // 1 ms before expiry: cached
    assert(tm.getToken() === "t1")
    now = TokenManager.DefaultTtlMs // at expiry: refreshed
    assert(tm.getToken() === "t2")
    assert(tm.grantCount === 2)
  }

  test("concurrent getToken stampede issues a single grant") {
    val tr = new FakeTransport(grant("t1"))
    val tm = new TokenManager("e", "c", "s", tr, clock = () => 0L)
    val threads = (1 to 8).map(_ => new Thread(() => { tm.getToken(); () }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(tm.grantCount === 1)
  }

  test("failed grant (non-2xx / missing field) raises") {
    val bad = new TokenManager("e", "c", "s",
      new FakeTransport(HttpResponse(500, Map.empty, "boom")),
      clock = () => 0L)
    intercept[java.io.IOException](bad.getToken())
    val noField = new TokenManager("e", "c", "s",
      new FakeTransport(HttpResponse(200, Map.empty, """{"oops":1}""")),
      clock = () => 0L)
    intercept[java.io.IOException](noField.getToken())
  }

  test("pager follows next_page_token and bearers the current token") {
    val tr = new FakeTransport(
      grant("tok"),
      HttpResponse(200, Map.empty, """{"items":[1],"next_page_token":"p2"}"""),
      HttpResponse(200, Map.empty, """{"items":[2],"next_page_token":"p3"}"""),
      HttpResponse(200, Map.empty, """{"items":[3]}"""))
    val tm = new TokenManager("e", "c", "s", tr, clock = () => 0L)
    val pages = PagedFetcher.pages("https://api/users",
      Map("page_size" -> "300"), tm, tr, sleeper = _ => ()).toList
    assert(pages.map(_.get("items").get(0).asInt()) === List(1, 2, 3))
    assert(tr.gets.size === 3)
    assert(tr.gets.forall(_._2("Authorization") == "Bearer tok"))
    assert(tr.gets.head._3 === Map("page_size" -> "300"))
    assert(tr.gets(1)._3("next_page_token") === "p2")
    assert(tr.gets(2)._3("next_page_token") === "p3")
  }

  test("429 sleeps Retry-After seconds (default 60, capped) and retries") {
    val tr = new FakeTransport(
      grant("tok"),
      HttpResponse(429, Map("Retry-After" -> "7"), ""),
      HttpResponse(429, Map.empty, ""), // no header → default 60 s
      HttpResponse(429, Map("Retry-After" -> "99999"), ""), // capped
      HttpResponse(200, Map.empty, """{"done":true}"""))
    val tm = new TokenManager("e", "c", "s", tr, clock = () => 0L)
    val slept = mutable.Buffer.empty[Long]
    val pages = PagedFetcher.pages("u", Map.empty, tm, tr,
      sleeper = slept += _, maxRetryAfterMs = 300000L).toList
    assert(pages.size === 1)
    assert(slept.toList === List(7000L, 60000L, 300000L))
  }

  test("persistent 429 fails after maxAttempts instead of looping") {
    val tr = new FakeTransport(
      grant("tok") +: Seq.fill(10)(HttpResponse(429, Map.empty, "")): _*)
    val tm = new TokenManager("e", "c", "s", tr, clock = () => 0L)
    val ex = intercept[java.io.IOException] {
      PagedFetcher.pages("u", Map.empty, tm, tr, sleeper = _ => (),
        maxAttempts = 3).toList
    }
    assert(ex.getMessage.contains("429"))
  }

  test("401 re-grants once and retries; a second 401 raises") {
    val tr = new FakeTransport(
      grant("old"),
      HttpResponse(401, Map.empty, ""),
      grant("fresh"),
      HttpResponse(200, Map.empty, """{"ok":1}"""))
    val tm = new TokenManager("e", "c", "s", tr, clock = () => 0L)
    val pages = PagedFetcher.pages("u", Map.empty, tm, tr,
      sleeper = _ => ()).toList
    assert(pages.size === 1)
    assert(tm.grantCount === 2)
    assert(tr.gets.last._2("Authorization") === "Bearer fresh")

    val tr2 = new FakeTransport(
      grant("a"), HttpResponse(401, Map.empty, ""),
      grant("b"), HttpResponse(401, Map.empty, ""))
    val tm2 = new TokenManager("e", "c", "s", tr2, clock = () => 0L)
    intercept[java.io.IOException] {
      PagedFetcher.pages("u", Map.empty, tm2, tr2, sleeper = _ => ()).toList
    }
  }

  test("non-retryable status raises with the url and code") {
    val tr = new FakeTransport(grant("tok"),
      HttpResponse(500, Map.empty, "ise"))
    val tm = new TokenManager("e", "c", "s", tr, clock = () => 0L)
    val ex = intercept[java.io.IOException] {
      PagedFetcher.pages("https://api/x", Map.empty, tm, tr,
        sleeper = _ => ()).toList
    }
    assert(ex.getMessage.contains("500") &&
      ex.getMessage.contains("https://api/x"))
  }

  test("executor-singleton: same (endpoint, client) shares one manager") {
    val tr = new FakeTransport()
    val a = TokenManager.forEndpoint("e1", "c1", "s", tr)
    val b = TokenManager.forEndpoint("e1", "c1", "s", tr)
    val c = TokenManager.forEndpoint("e2", "c1", "s", tr)
    assert(a eq b)
    assert(!(a eq c))
  }
}
