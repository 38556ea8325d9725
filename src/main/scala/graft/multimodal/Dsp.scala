package graft.multimodal

/** Pure-JVM DSP for real audio features: iterative radix-2 FFT,
  * triangular mel filterbank, log-mel spectrogram and MFCC (DCT-II) —
  * no native libraries, so the same jar computes real spectral
  * features on any executor. Standard textbook constructions
  * (Cooley–Tukey FFT; HTK-style mel scale `2595·log10(1+f/700)`;
  * Davis–Mermelstein MFCC), sized for the [[Media]] decode path:
  * frames are 25 ms / 10 ms hop by default, FFT length is the next
  * power of two, filters span [0, sampleRate/2].
  *
  * Scale posture: everything here is per-row math inside a
  * `mapPartitions` decode pass — no shuffle, no driver state; cost is
  * O(nFrames · nfft log nfft) per file, linear in corpus size.
  */
object Dsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT (decimation in time).
    * Array length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"FFT size must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val i0 = base + k
          val i1 = i0 + len / 2
          val xr = re(i1) * cr - im(i1) * ci
          val xi = re(i1) * ci + im(i1) * cr
          re(i1) = re(i0) - xr
          im(i1) = im(i0) - xi
          re(i0) += xr
          im(i0) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Power spectrum of a frame zero-padded to nfft: bins 0..nfft/2,
    * each |X[k]|²/nfft. */
  def powerSpectrum(frame: Array[Double], nfft: Int): Array[Double] = {
    val re = java.util.Arrays.copyOf(frame, nfft)
    val im = new Array[Double](nfft)
    fft(re, im)
    Array.tabulate(nfft / 2 + 1)(k =>
      (re(k) * re(k) + im(k) * im(k)) / nfft)
  }

  def hamming(n: Int): Array[Double] =
    if (n == 1) Array(1.0)
    else Array.tabulate(n)(i =>
      0.54 - 0.46 * math.cos(2.0 * math.Pi * i / (n - 1)))

  def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  def melToHz(m: Double): Double =
    700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank: nMels filters with centers equally
    * spaced on the mel scale over [0, sampleRate/2], evaluated on
    * fractional FFT-bin positions. Rows: nMels × (nfft/2+1). */
  def melFilterbank(nMels: Int, nfft: Int,
      sampleRate: Double): Array[Array[Double]] = {
    require(nMels > 0 && nfft > 0 && sampleRate > 0)
    val maxMel = hzToMel(sampleRate / 2.0)
    val binHz = sampleRate / nfft
    // nMels+2 edge points in mel space -> fractional bin positions
    val pts = Array.tabulate(nMels + 2)(i =>
      melToHz(i * maxMel / (nMels + 1)) / binHz)
    Array.tabulate(nMels) { m =>
      val lo = pts(m)
      val c = pts(m + 1)
      val hi = pts(m + 2)
      Array.tabulate(nfft / 2 + 1) { k =>
        if (k <= lo || k >= hi) 0.0
        else if (k <= c) (k - lo) / (c - lo)
        else (hi - k) / (hi - c)
      }
    }
  }

  /** Center frequency (Hz) of each mel filter — lets a caller map a
    * peak feature bin back to a physical frequency. */
  def melFilterCentersHz(nMels: Int, sampleRate: Double): Array[Double] = {
    val maxMel = hzToMel(sampleRate / 2.0)
    Array.tabulate(nMels)(m => melToHz((m + 1) * maxMel / (nMels + 1)))
  }

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** Log-mel spectrogram: Hamming-windowed frames (winMs long, hopMs
    * apart) → power spectrum (nfft = next pow2 of the window) → mel
    * filterbank → natural log (floored at 1e-10). Returns
    * nFrames × nMels; empty when the signal is shorter than one
    * window. */
  def logMelSpectrogram(samples: Array[Double], sampleRate: Double,
      nMels: Int = 26, winMs: Double = 25.0,
      hopMs: Double = 10.0): Array[Array[Double]] = {
    val win = math.max(2, (sampleRate * winMs / 1000.0).toInt)
    val hop = math.max(1, (sampleRate * hopMs / 1000.0).toInt)
    if (samples.length < win) return Array.empty
    val nfft = nextPow2(win)
    val w = hamming(win)
    val fb = melFilterbank(nMels, nfft, sampleRate)
    val nFrames = (samples.length - win) / hop + 1
    Array.tabulate(nFrames) { fi =>
      val frame = new Array[Double](nfft)
      var i = 0
      while (i < win) { frame(i) = samples(fi * hop + i) * w(i); i += 1 }
      val ps = powerSpectrum(frame, nfft)
      Array.tabulate(nMels) { m =>
        val row = fb(m)
        var acc = 0.0
        var k = 0
        while (k < ps.length) { acc += row(k) * ps(k); k += 1 }
        math.log(math.max(acc, 1e-10))
      }
    }
  }

  /** Orthonormal DCT-II, first nCoef coefficients. */
  def dct2(xs: Array[Double], nCoef: Int): Array[Double] = {
    val n = xs.length
    require(n > 0 && nCoef > 0 && nCoef <= n,
      s"need 0 < nCoef <= ${n}, got $nCoef")
    Array.tabulate(nCoef) { k =>
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += xs(i) * math.cos(math.Pi * k * (i + 0.5) / n)
        i += 1
      }
      acc * (if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n))
    }
  }

  /** MFCC: DCT-II of each log-mel frame, keeping nCoef coefficients
    * (c0 = overall log energy). Returns nFrames × nCoef. */
  def mfcc(samples: Array[Double], sampleRate: Double, nMels: Int = 26,
      nCoef: Int = 13, winMs: Double = 25.0,
      hopMs: Double = 10.0): Array[Array[Double]] =
    logMelSpectrogram(samples, sampleRate, nMels, winMs, hopMs)
      .map(dct2(_, nCoef))

  /** Time-mean pooling of a framewise feature matrix into one vector —
    * the utterance-level representation the dedup/similarity operators
    * consume. Empty input pools to an empty vector. */
  def meanPool(frames: Array[Array[Double]]): Array[Float] =
    if (frames.isEmpty) Array.empty
    else {
      val d = frames(0).length
      val acc = new Array[Double](d)
      frames.foreach { fr =>
        var i = 0
        while (i < d) { acc(i) += fr(i); i += 1 }
      }
      acc.map(v => (v / frames.length).toFloat)
    }
}
