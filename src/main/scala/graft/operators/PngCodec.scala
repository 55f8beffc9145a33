package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec in pure JVM — no media libraries, just
  * `java.util.zip` (the zlib bindings the PNG spec is defined
  * against) plus the filter byte arithmetic of ISO 15948 / RFC 2083.
  * This upgrades the multimodal pipeline's pixel path from the
  * documented deterministic stub to a genuine decode → resample →
  * encode chain for the one raster format whose compression the JDK
  * ships: images round-trip through actual IDAT inflate, per-row
  * unfiltering (all five filter types: None/Sub/Up/Average/Paeth,
  * spec §9), and re-encode with the standard minimum-sum-of-absolute-
  * differences filter heuristic.
  *
  * Scope (deliberate): 8-bit depth, color types 0 (grayscale) and 2
  * (truecolor RGB), non-interlaced. Anything else — palette, alpha,
  * 16-bit, Adam7 — decodes to None and the caller falls back to the
  * metadata-only path, the same quarantine discipline as
  * [[Multimodal.ImageCodec]]: a codec must never fabricate pixels.
  * Chunk CRCs are verified on read (corrupt data → None, not garbage
  * pixels) and emitted for real on write.
  *
  * Everything here is per-row byte arithmetic on one image at a time:
  * the engine only ever calls it inside batched `mapPartitions`, so
  * the work distributes with the data and no pixel buffer crosses an
  * executor boundary (the 100 TB multimodal contract — see
  * reference main.py:759-817 for the upload/binary handling this
  * generalizes).
  */
object PngCodec {

  /** Decoded raster: `channels` is 1 (gray) or 3 (RGB); `pixels` is
    * row-major, `width*height*channels` bytes, unsigned samples. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte]) {
    require(channels == 1 || channels == 3, s"channels must be 1|3: $channels")
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
  }

  private val Signature: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be32At(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  // ------------------------------------------------------------------
  // Encode
  // ------------------------------------------------------------------

  /** Serialize to a spec-valid PNG: IHDR + one IDAT (zlib level 6,
    * fixed for determinism) + IEND, real CRC-32s throughout. Each row
    * gets the filter (of all five) minimizing the sum of absolute
    * values of the filtered bytes — the heuristic from the spec's
    * recommendation (§12.8), so decoders must exercise every
    * unfilter path on realistic content. */
  def encode(img: Image): Array[Byte] = {
    val bpp = img.channels
    val stride = img.width * bpp
    val raw = new Array[Byte]((stride + 1) * img.height)
    val prev = new Array[Byte](stride) // zero row above the first
    val cur = new Array[Byte](stride)
    val filtered = Array.ofDim[Byte](5, stride)
    var y = 0
    while (y < img.height) {
      System.arraycopy(img.pixels, y * stride, cur, 0, stride)
      var best = 0
      var bestScore = Long.MaxValue
      var f = 0
      while (f < 5) {
        val out = filtered(f)
        var score = 0L
        var x = 0
        while (x < stride) {
          val a = if (x >= bpp) cur(x - bpp) & 0xff else 0
          val b = prev(x) & 0xff
          val c = if (x >= bpp) prev(x - bpp) & 0xff else 0
          val v = cur(x) & 0xff
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >> 1
            case _ => paeth(a, b, c)
          }
          val e = (v - pred) & 0xff
          out(x) = e.toByte
          // signed-magnitude score per the spec's heuristic
          score += (if (e < 128) e else 256 - e)
          x += 1
        }
        if (score < bestScore) { bestScore = score; best = f }
        f += 1
      }
      raw(y * (stride + 1)) = best.toByte
      System.arraycopy(filtered(best), 0, raw, y * (stride + 1) + 1, stride)
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val idat = deflate(raw)
    val colorType = if (img.channels == 1) 0 else 2
    val ihdr = "IHDR".getBytes("US-ASCII") ++ be32(img.width.toLong) ++
      be32(img.height.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val bos = new java.io.ByteArrayOutputStream(idat.length + 64)
    Signature.foreach(v => bos.write(v))
    writeChunk(bos, ihdr)
    writeChunk(bos, "IDAT".getBytes("US-ASCII") ++ idat)
    writeChunk(bos, "IEND".getBytes("US-ASCII"))
    bos.toByteArray
  }

  private def writeChunk(bos: java.io.ByteArrayOutputStream,
                         typeAndData: Array[Byte]): Unit = {
    bos.write(be32((typeAndData.length - 4).toLong), 0, 4)
    bos.write(typeAndData, 0, typeAndData.length)
    val crc = new CRC32(); crc.update(typeAndData)
    bos.write(be32(crc.getValue), 0, 4)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Parse + inflate + unfilter. None for anything outside the
    * supported profile, malformed framing, a CRC mismatch, or an
    * inflated payload of the wrong size — never a partial image. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 8 ||
        !Signature.indices.forall(i => (bytes(i) & 0xff) == Signature(i)))
      return None
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= bytes.length && !seenIend) {
      val len = be32At(bytes, i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > bytes.length)
        return None
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val crc = new CRC32(); crc.update(bytes, i + 4, 4 + len.toInt)
      if (crc.getValue != (be32At(bytes, i + 8 + len.toInt) & 0xffffffffL))
        return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          val w = be32At(bytes, i + 8); val h = be32At(bytes, i + 12)
          val bitDepth = bytes(i + 16) & 0xff
          val colorType = bytes(i + 17) & 0xff
          val compression = bytes(i + 18) & 0xff
          val filterMethod = bytes(i + 19) & 0xff
          val interlace = bytes(i + 20) & 0xff
          if (w <= 0 || h <= 0 || w > (1 << 24) || h > (1 << 24)) return None
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
              interlace != 0) return None
          channels = colorType match {
            case 0 => 1
            case 2 => 3
            case _ => return None // palette/alpha/etc: unsupported profile
          }
          width = w.toInt; height = h.toInt
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, i + 8, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      i += 12 + len.toInt
    }
    if (!seenIhdr || !seenIend) return None
    val stride = width * channels
    val expected = (stride + 1).toLong * height
    if (expected > Int.MaxValue) return None
    val raw = inflate(idat.toByteArray, expected.toInt).getOrElse(return None)
    unfilter(raw, width, height, channels).map(Image(width, height, channels, _))
  }

  private def inflate(deflated: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(deflated)
    val out = new Array[Byte](expected)
    try {
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      // exact size required: both short and long payloads are malformed
      if (off != expected || inf.inflate(new Array[Byte](1)) != 0) None
      else Some(out)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  private def unfilter(raw: Array[Byte], width: Int, height: Int,
                       channels: Int): Option[Array[Byte]] = {
    val bpp = channels
    val stride = width * bpp
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      if (f > 4) return None
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      val prevOut = rowOut - stride
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val b = if (y > 0) out(prevOut + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) out(prevOut + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case _ => paeth(a, b, c)
        }
        out(rowOut + x) = (((raw(rowIn + x) & 0xff) + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Paeth predictor, spec §9.4 — exact integer form. */
  private[graft] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------------
  // Resample
  // ------------------------------------------------------------------

  /** Box-average resize in exact integer arithmetic: target pixel
    * (tx, ty) averages the source rectangle
    * [tx*W/w2, (tx+1)*W/w2) × [ty*H/h2, (ty+1)*H/h2) (floor division,
    * empty boxes widened to one source pixel for upscales), each
    * channel floor(sum/count). Deterministic and closed-form — for
    * integer downscale factors the oracle can state the same floor
    * average in SQL, which is why box (not bilinear) is the resample
    * the query surface pins. */
  def resizeBox(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0, s"target dims must be positive: ${w2}x$h2")
    val ch = img.channels
    val out = new Array[Byte](w2 * h2 * ch)
    var ty = 0
    while (ty < h2) {
      val sy0 = (ty.toLong * img.height / h2).toInt
      val sy1 = math.max(sy0 + 1, ((ty + 1).toLong * img.height / h2).toInt)
      var tx = 0
      while (tx < w2) {
        val sx0 = (tx.toLong * img.width / w2).toInt
        val sx1 = math.max(sx0 + 1, ((tx + 1).toLong * img.width / w2).toInt)
        val count = (sy1 - sy0).toLong * (sx1 - sx0)
        var c = 0
        while (c < ch) {
          var sum = 0L
          var sy = sy0
          while (sy < sy1) {
            var sx = sx0
            val base = (sy * img.width) * ch + c
            while (sx < sx1) {
              sum += img.pixels(base + sx * ch) & 0xff
              sx += 1
            }
            sy += 1
          }
          out((ty * w2 + tx) * ch + c) = (sum / count).toByte
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    Image(w2, h2, ch, out)
  }
}
