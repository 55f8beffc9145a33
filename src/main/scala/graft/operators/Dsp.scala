package graft.operators

/** Minimal DSP kernel for the audio path: an in-place radix-2
  * Cooley–Tukey FFT (the public textbook algorithm) and the power
  * spectrum over decoded PCM. Pure JVM double arithmetic — like every
  * codec here it only runs inside batched `mapPartitions`, one clip
  * at a time, sequentially per row, so results are deterministic for
  * a given JVM (and the query surface rounds at 4 dp per the
  * documented cross-engine float discipline; DspSpec additionally
  * pins the FFT against a direct O(n^2) DFT reference). */
object Dsp {

  /** In-place radix-2 FFT of (re, im); length must be a power of 2. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of 2: $n")
    // Bit-reversal permutation.
    var j = 0
    var i = 1
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
    // Butterflies.
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k; val b = base + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** One-sided power spectrum of the first `n` MONO frames of a clip:
    * |X[k]|^2 for k = 0..n/2 (n power of 2; clip must be mono and
    * hold at least n frames — the deterministic window contract the
    * query states). */
  def powerSpectrum(clip: WavCodec.Clip, n: Int): Array[Double] = {
    require(clip.channels == 1, "powerSpectrum expects a mono clip")
    require(clip.frames >= n, s"clip has ${clip.frames} < $n frames")
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = clip.samples(i).toDouble; i += 1 }
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }
}
