package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JpegCodec, Multimodal, PngCodec}

/** The pure-JVM baseline JPEG decoder: closed-form DC-only decode,
  * restart-marker handling, refusal of non-baseline streams, and the
  * decodePixels chain preference (hand-written codec before the JDK
  * fallback). Cross-validation against ImageIO lives in
  * ImageIoCrossSpec. */
class JpegCodecSpec extends AnyFunSuite {

  test("DC-only roundtrip is the exact closed form clamp(128 + dc/8)") {
    val w = 32; val h = 16 // 4 x 2 blocks
    val dcs = Array(0, 8, -8, 800, -800, 64, -64, 1016)
    val img = JpegCodec.decode(JpegCodec.encodeGrayDcOnly(w, h, dcs))
      .getOrElse(fail("our own DC-only JPEG did not decode"))
    assert(img.width == w && img.height == h && img.channels == 1)
    for (by <- 0 until 2; bx <- 0 until 4) {
      val dc = dcs(by * 4 + bx)
      val want = math.max(0, math.min(255, 128 + dc / 8))
      for (y <- 0 until 8; x <- 0 until 8) {
        val got = img.pixels((by * 8 + y) * w + bx * 8 + x) & 0xff
        assert(got == want, s"block ($bx,$by) pixel ($x,$y): $got != $want")
      }
    }
  }

  test("restart markers: DRI/RSTn reset the DC predictor mid-scan") {
    val w = 48; val h = 8 // 6 blocks, restart every 2 MCUs
    val dcs = Array(80, 160, -80, 240, 8, -8)
    val bytes = JpegCodec.encodeGrayDcOnly(w, h, dcs, restartEvery = 2)
    // the stream genuinely carries DRI + RST markers
    def hasMarker(m: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xdd) && hasMarker(0xd0) && hasMarker(0xd1))
    val img = JpegCodec.decode(bytes).getOrElse(fail("restart JPEG failed"))
    dcs.zipWithIndex.foreach { case (dc, i) =>
      val want = math.max(0, math.min(255, 128 + dc / 8))
      assert((img.pixels(i * 8) & 0xff) == want, s"block $i")
    }
    // a decoder that did NOT reset the predictor would mis-decode: the
    // per-segment diffs are coded against pred=0, so cross-check one
    // value from the second restart segment explicitly
    assert((img.pixels(2 * 8) & 0xff) == 128 - 10)
  }

  test("non-baseline and malformed streams are refused, not mis-decoded") {
    val good = JpegCodec.encodeGrayDcOnly(8, 8, Array(0))
    // flip SOF0 to SOF2 (progressive): refused by us
    val prog = good.clone()
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // truncated scan: refused
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty)
    // not a JPEG at all
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
  }

  test("decodePixels routes JPEG through JpegCodec (1-channel grayscale survives)") {
    // the ImageIO fallback normalizes to 3 channels; our codec keeps
    // grayscale single-channel — observable chain-order evidence
    val bytes = JpegCodec.encodeGrayDcOnly(16, 8, Array(8, 80))
    val img = Multimodal.decodePixels(bytes).getOrElse(fail("no decode"))
    assert(img.channels == 1)
    assert((img.pixels(0) & 0xff) == 129 && (img.pixels(8) & 0xff) == 138)
  }

  test("resize composes over our JPEG path and normalizes to PNG") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val bytes = JpegCodec.encodeGrayDcOnly(16, 16, Array(0, 8, -8, 16))
    val out = Multimodal.resized(spark.createDataset(Seq(
        Multimodal.MediaRow(1L,
          Multimodal.MediaMeta("image", "image/jpeg", 16, 16,
            bytes.length.toLong), bytes))), 8, 8)
      .head()
    assert(out.meta.format == "image/png")
    val half = PngCodec.decode(out.content).get
    assert(half.width == 8 && half.height == 8)
    // each resized quadrant is the box-average of a constant block
    assert((half.pixels(0) & 0xff) == 128)
  }
}
