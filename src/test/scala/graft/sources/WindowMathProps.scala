package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based guards for the streaming window math — the
  * boundary arithmetic (whole-second ISO rendering, lexicographic
  * ordering, offset serde) that batch-boundary exactly-once depends
  * on. Two real bugs lived exactly here during development: a
  * sub-second ISO string sorting before its own second, and the
  * year-10000 '+' prefix; these properties pin both.
  */
object WindowMathProps extends Properties("WindowMath") {

  // epoch ms from 1970 up to the last second of year 9999 minus the
  // ceil clamp margin (the clamp region is asserted separately)
  private val sane: Gen[Long] = Gen.choose(0L, 253402300799000L - 1000L)

  property("floorSec: <= ms, within 1s, whole-second") = forAll(sane) { ms =>
    val f = ZoomRows.epochMsOf(ZoomRows.isoFloorSec(ms)).get
    f <= ms && ms - f < 1000 && f % 1000 == 0
  }

  property("ceilSec: >= ms, within 1s, whole-second") = forAll(sane) { ms =>
    val c = ZoomRows.epochMsOf(ZoomRows.isoCeilSec(ms)).get
    c >= ms && c - ms < 1000 && c % 1000 == 0
  }

  property("whole-second ISO preserves numeric order lexicographically") =
    forAll(sane, sane) { (a, b) =>
      val x = math.min(a, b)
      val y = math.max(a, b)
      ZoomRows.isoFloorSec(x) <= ZoomRows.isoFloorSec(y)
    }

  property("floor/ceil never render the unsortable '+yyyyy' year form") =
    forAll(Gen.choose(0L, Long.MaxValue)) { ms =>
      !ZoomRows.isoFloorSec(ms).startsWith("+") &&
        !ZoomRows.isoCeilSec(ms).startsWith("+")
    }

  property("offset serde roundtrip") = forAll { (ms: Long) =>
    val off = ZoomMsOffset(ms)
    ZoomMsOffset(off.json().toLong) == off
  }

  property("epochMsOf: zone-offset form agrees with the Z form") =
    forAll(sane) { ms =>
      val whole = ms - ms % 1000
      val z = ZoomRows.isoFloorSec(whole)
      val offset = java.time.OffsetDateTime
        .ofInstant(java.time.Instant.ofEpochMilli(whole),
          java.time.ZoneOffset.ofHours(2)).toString
      ZoomRows.epochMsOf(z) == ZoomRows.epochMsOf(offset) &&
        ZoomRows.epochMsOf(z).contains(whole)
    }
}
