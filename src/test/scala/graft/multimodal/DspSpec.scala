package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pure-math guards for the JVM DSP stack behind the audio features:
  * the FFT against a naive DFT, Parseval's identity, DCT-II
  * orthonormality, mel-scale roundtrips and filterbank shape, and the
  * end-to-end property the feature path depends on — a pure tone's
  * log-mel spectrum peaks in the filter whose center is nearest the
  * tone. No Spark session needed: this is per-row executor math. */
class DspSpec extends AnyFunSuite {

  private def sine(freqHz: Double, sampleRate: Double, n: Int,
      amp: Double = 0.5): Array[Double] =
    Array.tabulate(n)(i =>
      amp * math.sin(2.0 * math.Pi * freqHz * i / sampleRate))

  test("fft matches a naive DFT") {
    val rnd = new scala.util.Random(42)
    val n = 64
    val x = Array.fill(n)(rnd.nextDouble() - 0.5)
    val re = x.clone()
    val im = new Array[Double](n)
    Dsp.fft(re, im)
    // naive O(n²) DFT as the oracle
    for (k <- 0 until n) {
      var sr = 0.0
      var si = 0.0
      for (i <- 0 until n) {
        val ang = -2.0 * math.Pi * k * i / n
        sr += x(i) * math.cos(ang)
        si += x(i) * math.sin(ang)
      }
      assert(math.abs(re(k) - sr) < 1e-9, s"re($k)")
      assert(math.abs(im(k) - si) < 1e-9, s"im($k)")
    }
  }

  test("fft satisfies Parseval's identity") {
    val rnd = new scala.util.Random(7)
    val n = 256
    val x = Array.fill(n)(rnd.nextDouble() - 0.5)
    val re = x.clone()
    val im = new Array[Double](n)
    Dsp.fft(re, im)
    val timeEnergy = x.map(v => v * v).sum
    val freqEnergy = (0 until n).map(k =>
      (re(k) * re(k) + im(k) * im(k)) / n).sum
    assert(math.abs(timeEnergy - freqEnergy) < 1e-9)
  }

  test("power spectrum of a bin-aligned sine peaks at its bin") {
    val n = 256
    val k0 = 16 // exactly 16 cycles in the frame: no leakage
    val x = sine(k0.toDouble, n.toDouble, n) // sampleRate=n => bin=freq
    val ps = Dsp.powerSpectrum(x, n)
    val peak = ps.indexOf(ps.max)
    assert(peak === k0)
    // everything off-bin is numerically zero for an aligned sine
    ps.zipWithIndex.filter(_._2 != k0).foreach { case (v, _) =>
      assert(v < 1e-12)
    }
  }

  test("fft rejects non-power-of-2 sizes") {
    intercept[IllegalArgumentException] {
      Dsp.fft(new Array[Double](12), new Array[Double](12))
    }
  }

  test("dct2 is orthonormal: constant input -> only c0; Parseval") {
    val const = Array.fill(16)(3.0)
    val c = Dsp.dct2(const, 16)
    assert(math.abs(c(0) - 3.0 * math.sqrt(16.0)) < 1e-9)
    c.drop(1).foreach(v => assert(math.abs(v) < 1e-9))
    val rnd = new scala.util.Random(11)
    val x = Array.fill(32)(rnd.nextDouble() - 0.5)
    val full = Dsp.dct2(x, 32)
    assert(math.abs(x.map(v => v * v).sum - full.map(v => v * v).sum)
      < 1e-9)
  }

  test("mel scale roundtrips and is monotone") {
    Seq(0.0, 100.0, 440.0, 1000.0, 4000.0, 8000.0).foreach { f =>
      assert(math.abs(Dsp.melToHz(Dsp.hzToMel(f)) - f) < 1e-6)
    }
    assert(Dsp.hzToMel(440.0) > Dsp.hzToMel(439.0))
  }

  test("mel filterbank: nonneg weights, unit peaks, ascending centers") {
    val nMels = 26
    val nfft = 256
    val sr = 8000.0
    val fb = Dsp.melFilterbank(nMels, nfft, sr)
    assert(fb.length === nMels && fb.head.length === nfft / 2 + 1)
    fb.foreach { row =>
      assert(row.forall(_ >= 0.0))
      assert(row.max > 0.0, "every filter covers at least one bin")
    }
    val centers = Dsp.melFilterCentersHz(nMels, sr)
    assert(centers.sliding(2).forall(p => p(1) > p(0)))
    assert(centers.last < sr / 2)
  }

  test("log-mel of a 440 Hz tone peaks in the filter nearest 440 Hz") {
    val sr = 8000.0
    val x = sine(440.0, sr, 2000) // 0.25 s, same shape as the fixture
    val mel = Dsp.logMelSpectrogram(x, sr, nMels = 26)
    assert(mel.nonEmpty)
    val pooled = Dsp.meanPool(mel)
    val centers = Dsp.melFilterCentersHz(26, sr)
    val peak = pooled.indexOf(pooled.max)
    val nearest = centers.indices.minBy(i => math.abs(centers(i) - 440.0))
    assert(peak === nearest,
      s"peak bin $peak (${centers(peak)} Hz) vs nearest $nearest " +
        s"(${centers(nearest)} Hz)")
  }

  test("mfcc: finite coefficients that discriminate tones; too-short " +
      "input gives no frames") {
    val sr = 8000.0
    val m = Dsp.mfcc(sine(440.0, sr, 2000), sr, nMels = 26, nCoef = 13)
    assert(m.nonEmpty && m.head.length === 13)
    m.foreach(fr => assert(fr.forall(v => !v.isNaN && !v.isInfinite)))
    // the coefficients carry SPECTRAL information: a 440 Hz and a
    // 1500 Hz tone of equal amplitude pool to clearly different
    // vectors (per-frame values ride on phase-dependent leakage, so
    // cross-frame equality is not a physical property to pin)
    val a = Dsp.meanPool(m)
    val b = Dsp.meanPool(Dsp.mfcc(sine(1500.0, sr, 2000), sr,
      nMels = 26, nCoef = 13))
    val dist = math.sqrt(a.zip(b).map { case (x, y) =>
      (x - y) * (x - y) }.sum.toDouble)
    assert(dist > 1.0, s"440 Hz vs 1500 Hz MFCC distance $dist")
    assert(Dsp.mfcc(sine(440.0, sr, 50), sr).isEmpty) // < one 25ms window
  }

  test("meanPool averages framewise features") {
    val pooled = Dsp.meanPool(Array(Array(1.0, 2.0), Array(3.0, 4.0)))
    assert(pooled.toSeq === Seq(2.0f, 3.0f))
    assert(Dsp.meanPool(Array.empty).isEmpty)
  }
}
