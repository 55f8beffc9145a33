package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dsp, WavCodec}

/** Radix-2 FFT pinned against a direct O(n^2) DFT reference,
  * Parseval's identity, and the rounding-boundary guard that makes
  * q_audio_spectrum's cross-engine 4 dp hash safe. */
class DspSpec extends AnyFunSuite {

  private def mix(i: Long): Double = {
    var x = i * 0x9e3779b97f4a7c15L
    x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
    ((x & 0xffff) - 0x8000).toDouble
  }

  private def dftPower(s: Array[Double], k: Int): Double = {
    var re = 0.0; var im = 0.0
    val n = s.length
    var i = 0
    while (i < n) {
      val th = -2.0 * math.Pi * k * i / n
      re += s(i) * math.cos(th); im += s(i) * math.sin(th)
      i += 1
    }
    re * re + im * im
  }

  test("FFT == direct DFT on random signals, all sizes 2..256") {
    for (n <- Seq(2, 4, 8, 32, 64, 256)) {
      val s = Array.tabulate(n)(i => mix(i * 31L + n))
      val re = s.clone(); val im = new Array[Double](n)
      Dsp.fft(re, im)
      (0 until n).foreach { k =>
        val want = dftPower(s, k)
        val got = re(k) * re(k) + im(k) * im(k)
        val tol = math.max(1e-6, want * 1e-9)
        assert(math.abs(got - want) <= tol, s"n=$n k=$k got=$got want=$want")
      }
    }
  }

  test("Parseval: spectrum energy equals n x signal energy") {
    val n = 64
    val s = Array.tabulate(n)(i => mix(i * 7L))
    val re = s.clone(); val im = new Array[Double](n)
    Dsp.fft(re, im)
    val specE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum
    val sigE = s.map(v => v * v).sum
    assert(math.abs(specE - n * sigE) <= 1e-6 * n * sigE)
  }

  test("powerSpectrum contract: mono window, one-sided bins") {
    val clip = WavCodec.Clip(8000, 1, Array.tabulate(64)(i => mix(i).toShort))
    val p = Dsp.powerSpectrum(clip, 64)
    assert(p.length == 33)
    (0 to 32).foreach { k =>
      val want = dftPower(clip.samples.map(_.toDouble), k)
      assert(math.abs(p(k) - want) <= math.max(1e-6, want * 1e-9), s"k=$k")
    }
    intercept[IllegalArgumentException] {
      Dsp.powerSpectrum(WavCodec.Clip(8000, 2, new Array[Short](8)), 4)
    }
    intercept[IllegalArgumentException] { Dsp.powerSpectrum(clip, 128) }
  }

  test("q_audio_spectrum constants sit clear of every 4dp rounding boundary") {
    // The query rounds floor(p_norm * 10000 + 0.5): a flip needs the
    // true value within engine-float-error (~1e-9 here) of a step
    // boundary (fractional part of p*10000 + 0.5 crossing an
    // integer). All 99 constants must keep a fat margin.
    var minDist = Double.MaxValue
    for (hp <- Seq(4, 8, 16); k <- 0 to 32) {
      val s = Array.tabulate(64)(i => if ((i / hp) % 2 == 0) 1.0 else -1.0)
      val p = dftPower(s, k)
      val scaled = p * 10000.0 + 0.5
      val dist = math.abs(scaled - math.rint(scaled))
      minDist = math.min(minDist, dist)
    }
    assert(minDist > 1e-3,
      s"a spectrum constant sits $minDist from a rounding boundary")
  }
}
