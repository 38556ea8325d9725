package graft.sources

/** Token-bucket rate limiter for partition readers — the engine-side
  * analog of the reference's 429/Retry-After handling
  * (src/zoom/extract.py:33-37): each executor-side reader paces its
  * upstream calls instead of reacting to throttling after the fact.
  *
  * Deterministic and testable: the clock is injectable; `acquire`
  * returns the wait in nanos (0 = token available) and the caller
  * decides whether to sleep — partition readers sleep, tests assert.
  */
final class TokenBucket(
    ratePerSec: Double,
    burst: Int,
    nanoTime: () => Long = System.nanoTime _) {
  require(ratePerSec > 0 && burst > 0)
  private val nanosPerToken = (1e9 / ratePerSec).toLong
  private var tokens: Double = burst.toDouble
  private var last: Long = nanoTime()

  /** Take one token; returns nanos the caller must wait (0 if none). */
  def acquire(): Long = synchronized {
    val now = nanoTime()
    tokens = math.min(burst.toDouble,
      tokens + (now - last).toDouble / nanosPerToken)
    last = now
    if (tokens >= 1.0) { tokens -= 1.0; 0L }
    else {
      // Deduct the token now (balance goes negative) so the token that
      // accrues during the returned wait is not credited twice — zeroing
      // here would let a tight acquireBlocking loop run at ~2x the rate.
      val wait = ((1.0 - tokens) * nanosPerToken).toLong
      tokens -= 1.0
      wait
    }
  }

  /** Acquire and sleep out the wait — the reader-side call. */
  def acquireBlocking(): Unit = {
    val wait = acquire()
    if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
  }
}

object TokenBucket {
  /** The reader-side convention: a positive rate paces, anything else
    * yields an effectively unlimited bucket (file fixtures, unset
    * options). One definition instead of a copy per reader. */
  def orUnlimited(ratePerSec: Double, burst: Int): TokenBucket =
    if (ratePerSec > 0) new TokenBucket(ratePerSec, math.max(burst, 1))
    else new TokenBucket(ratePerSec = 1e9, burst = 1000)
}
