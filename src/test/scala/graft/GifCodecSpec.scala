package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GifCodec, Multimodal, PngCodec}

/** Pure-JVM GIF codec: the LZW bit discipline pinned against a
  * hand-derived spec vector (width growth at the final flush is the
  * classic encoder/decoder desync), round trips across palette sizes
  * incl. forced dictionary re-clears, container framing, malformed
  * rejection, and the Multimodal wiring (first-frame pixels, animated
  * frame sampling). */
class GifCodecSpec extends AnyFunSuite {

  private def mix(i: Long): Int = {
    var x = i * 0x9e3779b97f4a7c15L
    x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
    (x & 0x7fffffff).toInt
  }

  test("LZW: hand-derived spec vector — [1,1,1,1,1] at minCode 2") {
    // Derivation (giflib ordering, LSB-first packing): codes
    // clear(4,w3) 1(w3) 6(w3) 6(w3) eoi(5,w4) — the width grows to 4
    // at the FINAL FLUSH (next=8 fills 1<<3), so EOI is a 4-bit code;
    // an encoder that only checks width growth on dictionary inserts
    // emits EOI at w3 and desyncs every decoder. Bytes: 0x8C 0x5D.
    val in = Array[Byte](1, 1, 1, 1, 1)
    val enc = GifCodec.lzwEncode(in, 2)
    assert(enc.toSeq == Seq(0x8c.toByte, 0x5d.toByte),
      s"got ${enc.map(b => f"0x${b & 0xff}%02X").mkString(",")}")
    // And the decode walk exercises the KwKwK case (code 6 arrives
    // while the dictionary top is 5).
    assert(GifCodec.lzwDecode(enc, 2, 100).get.toSeq == in.toSeq)
  }

  test("LZW: round trips across palette widths, incl. forced re-clear") {
    for {
      (minCode, alphabet) <- Seq((2, 4), (4, 16), (8, 256))
      n <- Seq(1, 7, 300, 20000) // 20000 random symbols force re-clear
    } {
      val in = Array.tabulate[Byte](n)(i =>
        (mix(i * 31L + minCode) % alphabet).toByte)
      val enc = GifCodec.lzwEncode(in, minCode)
      val out = GifCodec.lzwDecode(enc, minCode, n)
        .getOrElse(fail(s"decode failed minCode=$minCode n=$n"))
      assert(out.toSeq == in.toSeq, s"minCode=$minCode n=$n")
    }
  }

  test("container round trip: multi-frame animation, palette-resolved RGB") {
    val w = 19; val h = 11
    val palette = Array.tabulate(16)(k => Array(k * 16, 255 - k * 16, k))
    val frames = (0 until 5).map(f =>
      Array.tabulate[Byte](w * h)(i => ((i + f * 3) % 16).toByte))
    val bytes = GifCodec.encode(w, h, palette, frames)
    val gif = GifCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(gif.width == w && gif.height == h && gif.frames.size == 5)
    gif.frames.zip(frames).foreach { case (img, idx) =>
      assert(img.channels == 3)
      idx.zipWithIndex.foreach { case (pi, k) =>
        val c = palette(pi & 0xff)
        assert((img.pixels(3 * k) & 0xff) == c(0) &&
          (img.pixels(3 * k + 1) & 0xff) == c(1) &&
          (img.pixels(3 * k + 2) & 0xff) == c(2), s"pixel $k")
      }
    }
    // Header sniffer agrees on dimensions.
    val meta = Multimodal.ImageCodec.sniff(bytes).get
    assert(meta.format == "image/gif" && meta.width == w && meta.height == h)
  }

  test("malformed inputs reject; unsupported profiles reject") {
    val good = GifCodec.encode(4, 4,
      Array.tabulate(4)(k => Array(k, k, k)),
      Seq(Array.tabulate[Byte](16)(i => (i % 4).toByte)))
    assert(GifCodec.decode(good).isDefined)
    Seq(3, 6, 12, good.length / 2, good.length - 1).foreach { n =>
      assert(GifCodec.decode(good.take(n)).isEmpty, s"truncated at $n")
    }
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(GifCodec.decode(badMagic).isEmpty)
    // Header-only fixture (ImageHeaders.gif): sniffs, has no frames.
    val headerOnly = Multimodal.ImageHeaders.gif(10, 10)
    assert(Multimodal.ImageCodec.sniff(headerOnly).exists(_.width == 10))
    assert(GifCodec.decode(headerOnly).isEmpty)
    // Interlace flag on the image descriptor → out of profile.
    val desc = good.indexOfSlice(Seq[Byte](0x2c, 0, 0, 0, 0))
    assert(desc > 0)
    val interlaced = good.clone(); interlaced(desc + 9) = 0x40.toByte
    assert(GifCodec.decode(interlaced).isEmpty)
  }

  test("Multimodal wiring: first-frame pixels compose with resample; animation samples") {
    // decodePixels: GIF → RGB image that feeds the box resampler.
    val palette = Array.tabulate(8)(k => Array(k * 30, k * 20, k * 10))
    val idx = Array.tabulate[Byte](64)(i => (i % 8).toByte)
    val bytes = GifCodec.encode(8, 8, palette, Seq(idx))
    val img = Multimodal.decodePixels(bytes).getOrElse(fail("no pixels"))
    assert(img.width == 8 && img.channels == 3)
    val half = PngCodec.resizeBox(img, 4, 4)
    assert(half.width == 4 && half.pixels.length == 48)
    // sampledFrames: animated GIF takes the real path (stride 2 over
    // 6 frames keeps 0,2,4), frames are RGB planes.
    val spark = SparkTestBase.spark
    import spark.implicits._
    val anim = GifCodec.encode(4, 4, palette,
      (0 until 6).map(f => Array.tabulate[Byte](16)(i => ((i + f) % 8).toByte)))
    val rows = Seq(Multimodal.MediaRow(7L,
      Multimodal.MediaMeta("image", "image/gif", 4, 4, anim.length.toLong),
      anim))
    val kept = Multimodal.sampledFrames(spark.createDataset(rows),
        frameSize = 48, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(kept.length == 3)
    kept.zip(Seq(0, 2, 4)).foreach { case (fr, srcIdx) =>
      val expect = GifCodec.decode(anim).get.frames(srcIdx).pixels
      assert(fr.frame.toSeq == expect.toSeq, s"frame $srcIdx")
    }
  }
}
