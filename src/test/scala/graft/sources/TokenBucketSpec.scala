package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class TokenBucketSpec extends AnyFunSuite {

  test("burst tokens are free; sustained rate is enforced") {
    var now = 0L
    val tb = new TokenBucket(ratePerSec = 10, burst = 3, nanoTime = () => now)
    assert(tb.acquire() === 0L)
    assert(tb.acquire() === 0L)
    assert(tb.acquire() === 0L)     // burst exhausted
    assert(tb.acquire() === 100000000L) // 1/10 s wait
  }

  test("tokens refill with elapsed time, capped at burst") {
    var now = 0L
    val tb = new TokenBucket(ratePerSec = 10, burst = 2, nanoTime = () => now)
    tb.acquire(); tb.acquire()      // drain
    now += 10000000000L             // 10 s → refill far beyond burst
    assert(tb.acquire() === 0L)
    assert(tb.acquire() === 0L)     // only `burst` accumulated
    assert(tb.acquire() > 0L)
  }

  test("partial refill shortens the wait proportionally") {
    var now = 0L
    val tb = new TokenBucket(ratePerSec = 10, burst = 1, nanoTime = () => now)
    assert(tb.acquire() === 0L)
    now += 50000000L                // half a token accrued
    assert(tb.acquire() === 50000000L) // remaining half
  }

  test("tight acquireBlocking loop averages the configured rate") {
    // Simulate the blocking loop with the injectable clock: acquire,
    // sleep exactly the returned wait, immediately acquire again. The
    // waited-for token must be deducted (balance goes negative), or the
    // token accruing DURING the sleep is credited twice and the loop
    // admits ~2x the configured rate (t=0,100,100,200,200ms...).
    var now = 0L
    val tb = new TokenBucket(ratePerSec = 10, burst = 1, nanoTime = () => now)
    val n = 50
    val admitTimes = (1 to n).map { _ =>
      val wait = tb.acquire()
      now += wait                    // caller sleeps out the wait
      now
    }
    // first call free (burst); each subsequent admission exactly 100 ms apart
    assert(admitTimes.head === 0L)
    admitTimes.sliding(2).foreach { case Seq(a, b) =>
      assert(b - a === 100000000L,
        s"admissions must be 100ms apart, got ${(b - a) / 1e6}ms")
    }
  }
}
