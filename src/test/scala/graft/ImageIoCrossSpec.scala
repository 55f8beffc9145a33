package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GifCodec, ImageIoCodec, Multimodal, PngCodec}

/** Independent-implementation cross-validation: the hand-written
  * PNG/GIF codecs against the JDK's own ImageIO readers/writers
  * (javax.imageio — a separate implementation of the same public
  * specs). Agreement in BOTH directions pins spec compliance, not
  * just internal self-consistency; plus the real JPEG decode path
  * through [[ImageIoCodec]]. */
class ImageIoCrossSpec extends AnyFunSuite {

  private def mix(i: Long): Int = {
    var x = i * 0x9e3779b97f4a7c15L
    x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
    (x & 0xff).toInt
  }

  private def toBuffered(img: PngCodec.Image): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val k = (y * img.width + x) * img.channels
      val (r, g, b) =
        if (img.channels == 3)
          (img.pixels(k) & 0xff, img.pixels(k + 1) & 0xff, img.pixels(k + 2) & 0xff)
        else { val v = img.pixels(k) & 0xff; (v, v, v) }
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    bi
  }

  private def write(bi: java.awt.image.BufferedImage,
                    fmt: String): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, fmt, o), s"no $fmt writer")
    o.toByteArray
  }

  test("PngCodec.encode is readable by ImageIO with identical pixels") {
    // RGB: through the normalizing ImageIoCodec path.
    val rgb = PngCodec.Image(37, 23, 3,
      Array.tabulate(37 * 23 * 3)(i => mix(i + 3).toByte))
    val viaIio = ImageIoCodec.decode(PngCodec.encode(rgb))
      .getOrElse(fail("ImageIO rejected our RGB PNG"))
    assert(viaIio.width == 37 && viaIio.height == 23 && viaIio.channels == 3)
    assert(viaIio.pixels.toSeq == rgb.pixels.toSeq)
    // Grayscale: compare RAW raster samples — ImageIO's getRGB would
    // color-manage gray into sRGB (169 → 213), which is its gamma
    // handling, not a codec property; the raster carries the samples
    // our encoder wrote.
    val gray = PngCodec.Image(37, 23, 1,
      Array.tabulate(37 * 23)(i => mix(i + 1).toByte))
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(PngCodec.encode(gray)))
    assert(bi != null && bi.getWidth == 37 && bi.getHeight == 23)
    val raster = bi.getRaster
    for (y <- 0 until 23; x <- 0 until 37) {
      val ours = gray.pixels(y * 37 + x) & 0xff
      assert(raster.getSample(x, y, 0) == ours, s"gray sample ($x,$y)")
    }
  }

  test("ImageIO-written PNGs decode through PngCodec with identical pixels") {
    val src = PngCodec.Image(29, 17, 3,
      Array.tabulate(29 * 17 * 3)(i => mix(i * 7L).toByte))
    val bytes = write(toBuffered(src), "png")
    val back = PngCodec.decode(bytes)
      .getOrElse(fail("our decoder rejected an ImageIO PNG"))
    assert(back.width == 29 && back.height == 17 && back.channels == 3)
    assert(back.pixels.toSeq == src.pixels.toSeq)
  }

  test("GifCodec.encode is readable by ImageIO with identical palette-resolved pixels") {
    val palette = Array.tabulate(32)(k => Array(k * 8, 255 - k * 8, k * 3))
    val idx = Array.tabulate[Byte](21 * 13)(i => (mix(i) % 32).toByte)
    val ours = GifCodec.decode(GifCodec.encode(21, 13, palette, Seq(idx)))
      .get.frames.head
    val viaIio = ImageIoCodec.decode(GifCodec.encode(21, 13, palette, Seq(idx)))
      .getOrElse(fail("ImageIO rejected our GIF"))
    assert(viaIio.width == 21 && viaIio.height == 13)
    assert(viaIio.pixels.toSeq == ours.pixels.toSeq,
      "ImageIO and GifCodec disagree on our own GIF bytes")
  }

  test("JpegCodec DC-only bytes decode BIT-EXACT through ImageIO (independent impl)") {
    // DC-only blocks under an all-ones quant table: both our float
    // IDCT and libjpeg's integer IDCT reconstruct the exact constant
    // 128 + dc/8 (dc multiples of 8) — two implementations, one spec,
    // zero tolerance.
    val w = 40; val h = 24
    val dcs = Array.tabulate((w / 8) * (h / 8))(i => ((i * 7) % 120 - 56) * 8)
    val bytes = graft.operators.JpegCodec.encodeGrayDcOnly(w, h, dcs)
    val ours = graft.operators.JpegCodec.decode(bytes).get
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(bi != null && bi.getWidth == w && bi.getHeight == h,
      "ImageIO rejected our hand-assembled JPEG")
    val raster = bi.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == (ours.pixels(y * w + x) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
  }

  test("JpegCodec agrees with ImageIO on ImageIO-written JPEGs (AC + subsampling)") {
    // Grayscale (no chroma, IDCT differences only): |Δ| <= 1/sample.
    val gw = 41; val gh = 23 // non-multiple-of-8: edge MCU padding path
    val gbi = new java.awt.image.BufferedImage(gw, gh,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until gh; x <- 0 until gw)
      gbi.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 256)
    val gbytes = write(gbi, "jpg")
    val gours = graft.operators.JpegCodec.decode(gbytes)
      .getOrElse(fail("our decoder rejected an ImageIO grayscale JPEG"))
    assert(gours.width == gw && gours.height == gh && gours.channels == 1)
    val gback = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbytes)).getRaster
    val gerr = (for (y <- 0 until gh; x <- 0 until gw) yield
      math.abs(gback.getSample(x, y, 0) -
        (gours.pixels(y * gw + x) & 0xff))).max
    assert(gerr <= 1, s"grayscale max per-sample diff $gerr > 1")
    // Color 4:2:0 (ImageIO's default): chroma upsampling filters are
    // decoder's choice per the spec (ours is nearest, libjpeg's is
    // triangular) — smooth gradients bound the difference tightly.
    val src = PngCodec.Image(40, 24, 3,
      Array.tabulate(40 * 24 * 3) { i =>
        val k = i / 3; ((k % 40) * 3 + (k / 40) * 4).toByte })
    val cbytes = write(toBuffered(src), "jpg")
    val cours = graft.operators.JpegCodec.decode(cbytes)
      .getOrElse(fail("our decoder rejected an ImageIO color JPEG"))
    assert(cours.width == 40 && cours.height == 24 && cours.channels == 3)
    val cIio = ImageIoCodec.decode(cbytes).get
    val cerr = cours.pixels.zip(cIio.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(cerr <= 12, s"color max per-sample diff $cerr > 12")
  }

  test("JPEG decodes for real through the ImageIO fallback; resample composes") {
    // A smooth gradient survives JPEG within a tight error bound —
    // enough to pin that real DCT decoding happened (the stub would
    // fabricate 16x16-ish dims from byte length, not 40x24).
    val src = PngCodec.Image(40, 24, 3,
      Array.tabulate(40 * 24 * 3) { i =>
        val k = i / 3; ((k % 40) * 3 + (k / 40) * 4).toByte })
    val jpeg = write(toBuffered(src), "jpg")
    assert(PngCodec.decode(jpeg).isEmpty && GifCodec.decode(jpeg).isEmpty)
    val img = Multimodal.decodePixels(jpeg)
      .getOrElse(fail("JPEG did not decode"))
    assert(img.width == 40 && img.height == 24)
    val maxErr = img.pixels.zip(src.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 24, s"JPEG round trip error $maxErr too large")
    // Distributed resize takes the real path on JPEG input and
    // normalizes to PNG.
    val spark = SparkTestBase.spark
    import spark.implicits._
    val out = Multimodal.resized(spark.createDataset(Seq(
        Multimodal.MediaRow(1L,
          Multimodal.MediaMeta("image", "image/jpeg", 40, 24,
            jpeg.length.toLong), jpeg))), 20, 12)
      .head()
    assert(out.meta.format == "image/png")
    val half = PngCodec.decode(out.content).get
    assert(half.width == 20 && half.height == 12)
  }
}
