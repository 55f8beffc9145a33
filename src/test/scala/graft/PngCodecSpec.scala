package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, PngCodec}
import graft.operators.PngCodec.Image

/** The pure-JVM PNG pixel codec: encode/decode round trips across
  * both color profiles, every filter type's unfilter path, malformed
  * input rejection (CRC, truncation, unsupported profiles), and the
  * exact integer box-resample arithmetic the oracle-checked query
  * states in SQL. */
class PngCodecSpec extends AnyFunSuite {

  /** Deterministic pseudo-random pixels — no Random, reproducible. */
  private def mix(i: Long): Int = {
    var x = i * 0x9e3779b97f4a7c15L
    x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
    (x & 0xff).toInt
  }

  private def img(w: Int, h: Int, ch: Int, seed: Long): Image =
    Image(w, h, ch,
      Array.tabulate(w * h * ch)(i => mix(seed + i).toByte))

  test("round trip: random gray and RGB images across odd sizes") {
    for {
      (w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 2), (64, 48), (257, 5))
      ch <- Seq(1, 3)
    } {
      val src = img(w, h, ch, w * 1000L + h * 10 + ch)
      val bytes = PngCodec.encode(src)
      val back = PngCodec.decode(bytes)
        .getOrElse(fail(s"decode failed for ${w}x$h ch=$ch"))
      assert(back.width == w && back.height == h && back.channels == ch)
      assert(back.pixels.toSeq == src.pixels.toSeq,
        s"pixel mismatch at ${w}x$h ch=$ch")
      // And the header sniffer agrees with the pixel decoder.
      val meta = Multimodal.ImageCodec.sniff(bytes).get
      assert(meta.format == "image/png" && meta.width == w && meta.height == h)
    }
  }

  test("gradients round-trip (encoder picks non-None filters on smooth rows)") {
    // Horizontal/vertical/diagonal ramps make Sub/Up/Paeth win the
    // filter heuristic, so decode exercises real unfilter arithmetic,
    // not just filter 0.
    val w = 40; val h = 30
    val ramps = Seq[(Int, Int) => Int](
      (x, _) => (x * 6) % 256,
      (_, y) => (y * 8) % 256,
      (x, y) => (x * 3 + y * 5) % 256)
    ramps.zipWithIndex.foreach { case (f, i) =>
      val src = Image(w, h, 1,
        Array.tabulate(w * h)(k => f(k % w, k / w).toByte))
      val back = PngCodec.decode(PngCodec.encode(src)).get
      assert(back.pixels.toSeq == src.pixels.toSeq, s"ramp $i")
    }
  }

  test("every filter type unfilters correctly against a reference raw stream") {
    // Hand-build the raw (filtered) stream for one 4x3 RGB image per
    // filter type, wrap it in spec-valid chunks, and check decode
    // against independently computed expected pixels.
    val w = 4; val h = 3; val ch = 3
    val src = img(w, h, ch, 42L)
    def filterRow(f: Int, cur: Array[Byte], prev: Array[Byte]): Array[Byte] =
      Array.tabulate(cur.length) { x =>
        val a = if (x >= ch) cur(x - ch) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= ch) prev(x - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case _ => PngCodec.paeth(a, b, c)
        }
        (((cur(x) & 0xff) - pred) & 0xff).toByte
      }
    (0 to 4).foreach { f =>
      val stride = w * ch
      val rows = (0 until h).map { y =>
        val cur = src.pixels.slice(y * stride, (y + 1) * stride)
        val prev = if (y == 0) new Array[Byte](stride)
          else src.pixels.slice((y - 1) * stride, y * stride)
        f.toByte +: filterRow(f, cur, prev)
      }
      val raw = rows.flatten.toArray
      val bytes = wrapRaw(w, h, colorType = 2, raw)
      val back = PngCodec.decode(bytes)
        .getOrElse(fail(s"decode failed for filter $f"))
      assert(back.pixels.toSeq == src.pixels.toSeq, s"filter $f")
    }
  }

  /** Minimal spec-valid PNG around an already-filtered raw stream. */
  private def wrapRaw(w: Int, h: Int, colorType: Int,
                      raw: Array[Byte]): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typeAndData: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32(); crc.update(typeAndData)
      be32((typeAndData.length - 4).toLong) ++ typeAndData ++ be32(crc.getValue)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++
      chunk("IHDR".getBytes("US-ASCII") ++ be32(w.toLong) ++ be32(h.toLong) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)) ++
      chunk("IDAT".getBytes("US-ASCII") ++ bos.toByteArray) ++
      chunk("IEND".getBytes("US-ASCII"))
  }

  test("malformed inputs decode to None, never garbage") {
    val good = PngCodec.encode(img(8, 8, 3, 7L))
    assert(PngCodec.decode(good).isDefined)
    // CRC corruption (flip a bit inside IDAT data).
    val corrupt = good.clone(); corrupt(good.length - 20) =
      (corrupt(good.length - 20) ^ 1).toByte
    assert(PngCodec.decode(corrupt).isEmpty, "corrupted CRC must reject")
    // Truncations at every boundary class.
    Seq(4, 8, 20, good.length / 2, good.length - 1).foreach { n =>
      assert(PngCodec.decode(good.take(n)).isEmpty, s"truncated at $n")
    }
    // Unsupported profiles: palette color, 16-bit depth, interlaced.
    val raw = Array.fill[Byte](9 * 3)(0) // 3 rows of filter0 + 8 gray px
    val raw8 = (0 until 3).flatMap(_ => 0.toByte +: Array.fill[Byte](8)(1)).toArray
    val pal = wrapRaw(8, 3, colorType = 3, raw8)
    assert(PngCodec.decode(pal).isEmpty, "palette must reject")
    val deep = PngCodec.encode(img(4, 4, 1, 9L)).clone()
    deep(24) = 16 // IHDR bit depth byte → CRC now wrong too
    assert(PngCodec.decode(deep).isEmpty)
    // Header-only PNG (the ImageHeaders fixture): dims sniff fine but
    // there are no pixels — the pixel decoder must refuse.
    val headerOnly = Multimodal.ImageHeaders.png(100, 50)
    assert(Multimodal.ImageCodec.sniff(headerOnly).exists(_.width == 100))
    assert(PngCodec.decode(headerOnly).isEmpty)
    assert(raw.length == 27) // silence unused warning path
  }

  test("resizeBox: exact 2x2 floor averages, upscale replication, identity") {
    // 4x4 gray with known values.
    val v = Array.tabulate(16)(i => (i * 10).toByte)
    val src = Image(4, 4, 1, v)
    val half = PngCodec.resizeBox(src, 2, 2)
    // Box (0,0): values 0,10,40,50 → floor(100/4)=25, etc.
    assert(half.pixels.map(_ & 0xff).toSeq == Seq(25, 45, 105, 125))
    // Identity resize is a no-op.
    assert(PngCodec.resizeBox(src, 4, 4).pixels.toSeq == v.toSeq)
    // Upscale: each target maps to one source pixel (nearest by box).
    val up = PngCodec.resizeBox(Image(2, 1, 1, Array[Byte](10, 20)), 4, 1)
    assert(up.pixels.map(_ & 0xff).toSeq == Seq(10, 10, 20, 20))
    // Floor (not round): 2x1 {1,2} → 1x1 floor(3/2)=1.
    val fl = PngCodec.resizeBox(Image(2, 1, 1, Array[Byte](1, 2)), 1, 1)
    assert(fl.pixels.head.toInt == 1)
    // RGB channels resample independently.
    val rgb = Image(2, 2, 3, Array[Byte](
      10, 100, -56, 20, 110, -46, // row 0: (10,100,200) (20,110,210)
      30, 120, -36, 40, -126, -26)) // row 1: (30,120,220) (40,130,230)
    val one = PngCodec.resizeBox(rgb, 1, 1)
    assert(one.pixels.map(_ & 0xff).toSeq == Seq(25, 115, 215))
  }

  test("property: random images round-trip across random sizes (seeded gen)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.chooseNum(1, 97)
      h <- Gen.chooseNum(1, 61)
      ch <- Gen.oneOf(1, 3)
      seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield (w, h, ch, seed)
    val cases = (0 until 60)
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 50)
    cases.foreach { case (w, h, ch, seed) =>
      val src = img(w, h, ch, seed)
      val back = PngCodec.decode(PngCodec.encode(src))
        .getOrElse(fail(s"decode failed ${w}x$h ch=$ch seed=$seed"))
      assert(back.pixels.toSeq == src.pixels.toSeq,
        s"round trip ${w}x$h ch=$ch seed=$seed")
      // Resize never crashes and lands the exact target geometry for
      // arbitrary (including non-divisor) targets.
      val rw = 1 + (seed % w).toInt; val rh = 1 + (seed % h).toInt
      val r = PngCodec.resizeBox(src, rw, rh)
      assert(r.width == rw && r.height == rh &&
        r.pixels.length == rw * rh * ch)
    }
  }

  test("Multimodal.resized takes the real PNG path end-to-end") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // 8x8 gray ramps per id, encoded for real; resize to 4x4 must
    // produce re-decodable PNGs whose pixels equal the reference
    // box-average of the source.
    val rows = (0L until 20L).map { id =>
      val src = Image(8, 8, 1,
        Array.tabulate(64)(i => ((i * 3 + id * 17) % 256).toByte))
      Multimodal.MediaRow(id,
        Multimodal.MediaMeta("image", "image/png", 8, 8, 0L),
        PngCodec.encode(src))
    }
    val out = Multimodal.resized(spark.createDataset(rows), 4, 4)
      .collect().map(r => r.media_id -> r).toMap
    (0L until 20L).foreach { id =>
      val r = out(id)
      assert(r.meta.format == "image/png" && r.meta.width == 4)
      val back = PngCodec.decode(r.content).get
      val expect = PngCodec.resizeBox(Image(8, 8, 1,
        Array.tabulate(64)(i => ((i * 3 + id * 17) % 256).toByte)), 4, 4)
      assert(back.pixels.toSeq == expect.pixels.toSeq, s"id=$id")
    }
    // Non-PNG payloads still take the stub path (contract unchanged).
    val txt = Multimodal.MediaRow(99L,
      Multimodal.MediaMeta("image", "fake/bmp", 16, 16, 5L),
      "hello".getBytes("UTF-8"))
    val stubOut = Multimodal.resized(spark.createDataset(Seq(txt)), 4, 4)
      .head()
    assert(stubOut.meta.format == "fake/bmp")
  }
}
