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
}
