package graft.operators

/** REAL GIF pixel codec in pure JVM — the GIF87a/89a LZW variant
  * (variable-width codes, clear/EOI, 4096-entry dictionary) is plain
  * bit arithmetic, so palette-image decode and ANIMATED-GIF frame
  * demux run for real without any media library, per the public
  * GIF89a specification. Completes the raster set next to
  * [[PngCodec]]: PNG covers truecolor via zlib, GIF covers
  * palette + animation via LZW.
  *
  * Supported profile: global color table, non-interlaced frames,
  * frames positioned at the full logical screen (the shape our
  * encoder emits and the common single-image/animation case). Local
  * color tables, interlacing, and partial-screen frames decode to
  * None — the quarantine discipline: never fabricate pixels.
  * Graphic-control/comment/application extensions are skipped
  * (sub-block framing honored). Output frames are palette-resolved
  * RGB ([[PngCodec.Image]] with 3 channels), so downstream pixel ops
  * (box resample, stats) compose directly.
  */
object GifCodec {

  /** Animated stream: every frame is a full-screen RGB raster. */
  final case class Gif(width: Int, height: Int,
                       frames: Seq[PngCodec.Image])

  // ------------------------------------------------------------------
  // LZW (GIF variant)
  // ------------------------------------------------------------------

  /** Compress index stream with GIF-LZW at `minCodeSize` (palette
    * bits, >= 2): emits clear code first, grows code width 3..12,
    * re-clears before the 4095 ceiling, ends with EOI. Returns the
    * raw code bytes (NOT yet sub-block framed).
    *
    * Width discipline (the classic desync trap): the growth check
    * runs inside EVERY emit, against the next-code-to-assign BEFORE
    * the pending dictionary insert — the giflib ordering. The decoder
    * (one dictionary entry behind) grows after adding the entry that
    * fills (1<<width)-1; these two rules keep both sides reading and
    * writing each code at the identical width, including the EOI
    * after a final-flush growth boundary. */
  private[graft] def lzwEncode(indices: Array[Byte],
                                   minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"minCodeSize $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var bits = 0
    var width = minCodeSize + 1
    var dict = collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = eoi + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << bits; bits += width
      while (bits >= 8) { out.write((cur & 0xff).toInt); cur >>>= 8; bits -= 8 }
      if (next >= (1 << width) && width < 12) width += 1
    }
    emit(clear)
    var prefix = -1
    indices.foreach { b =>
      val k = b & 0xff
      if (prefix < 0) prefix = k
      else dict.get((prefix, k)) match {
        case Some(code) => prefix = code
        case None =>
          emit(prefix)
          if (next >= 4095) { // ceiling: re-clear instead of inserting
            emit(clear)
            dict = collection.mutable.HashMap.empty
            next = eoi + 1
            width = minCodeSize + 1
          } else {
            dict((prefix, k)) = next
            next += 1
          }
          prefix = k
      }
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (bits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  /** Decompress GIF-LZW code bytes; None on any malformed stream
    * (bad code, missing EOI tolerated at end-of-data per common
    * practice — but codes beyond the dictionary reject). */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                                   maxPixels: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    // Dictionary as (prefixCode, lastByte); roots are 0..clear-1.
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCodeSize + 1
    var cur = 0L; var bits = 0; var i = 0
    var prev = -1
    def expand(codeIn: Int): Option[Array[Byte]] = {
      var code = codeIn
      val stack = new Array[Byte](4096)
      var sp = 0
      while (code >= clear) { // walk the chain (codes > eoi)
        if (code >= next || sp >= 4096) return None
        stack(sp) = byteOf(code); sp += 1
        code = prefixOf(code)
      }
      stack(sp) = code.toByte; sp += 1
      val res = new Array[Byte](sp)
      var j = 0
      while (j < sp) { res(j) = stack(sp - 1 - j); j += 1 }
      Some(res)
    }
    while (i < data.length || bits >= width) {
      while (bits < width && i < data.length) {
        cur |= (data(i) & 0xffL) << bits; bits += 8; i += 1
      }
      if (bits < width) return Some(out.toByteArray) // data exhausted
      val code = (cur & ((1L << width) - 1)).toInt
      cur >>>= width; bits -= width
      if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return Some(out.toByteArray)
      } else {
        val seq =
          if (code < next && (code < clear || code > eoi)) expand(code)
          else if (code == next && prev >= 0) // the KwKwK case
            expand(prev).map(p => p :+ p(0))
          else return None
        val s = seq.getOrElse(return None)
        out.write(s, 0, s.length)
        if (out.size > maxPixels) return None // oversized stream
        if (prev >= 0 && next < 4096) {
          prefixOf(next) = prev; byteOf(next) = s(0)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out.toByteArray)
  }

  // ------------------------------------------------------------------
  // Container
  // ------------------------------------------------------------------

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Serialize full-screen frames over one global `palette`
    * (<= 256 RGB entries); every frame's pixels must resolve to
    * palette indices exactly. Animated when frames > 1 (no timing
    * metadata — pure pixel transport). */
  def encode(width: Int, height: Int, palette: Array[Array[Int]],
             frameIndices: Seq[Array[Byte]]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, "palette 1..256")
    require(frameIndices.nonEmpty, "at least one frame")
    frameIndices.zipWithIndex.foreach { case (f, fi) =>
      require(f.length == width * height,
        s"frame $fi has ${f.length} indices, expected ${width * height}")
      var k = 0
      while (k < f.length) {
        require((f(k) & 0xff) < palette.length,
          s"frame $fi index ${f(k) & 0xff} outside palette of ${palette.length}")
        k += 1
      }
    }
    var palBits = 1
    while ((1 << palBits) < palette.length) palBits += 1
    val palSize = 1 << palBits
    val o = new java.io.ByteArrayOutputStream()
    o.write("GIF89a".getBytes("US-ASCII"))
    o.write(width & 0xff); o.write((width >> 8) & 0xff)
    o.write(height & 0xff); o.write((height >> 8) & 0xff)
    o.write(0x80 | (palBits - 1)) // GCT present, 2^palBits entries
    o.write(0); o.write(0) // background, aspect
    (0 until palSize).foreach { k =>
      val c = if (k < palette.length) palette(k) else Array(0, 0, 0)
      o.write(c(0)); o.write(c(1)); o.write(c(2))
    }
    val minCode = math.max(2, palBits)
    frameIndices.foreach { idx =>
      o.write(0x2c) // image descriptor, full screen, no local table
      o.write(0); o.write(0); o.write(0); o.write(0)
      o.write(width & 0xff); o.write((width >> 8) & 0xff)
      o.write(height & 0xff); o.write((height >> 8) & 0xff)
      o.write(0)
      o.write(minCode)
      val lzw = lzwEncode(idx, minCode)
      var p = 0
      while (p < lzw.length) { // 255-byte sub-blocks
        val n = math.min(255, lzw.length - p)
        o.write(n); o.write(lzw, p, n); p += n
      }
      o.write(0) // block terminator
    }
    o.write(0x3b)
    o.toByteArray
  }

  /** Parse + LZW-decode every frame to palette-resolved RGB. */
  def decode(bytes: Array[Byte]): Option[Gif] = {
    if (bytes.length < 14) return None
    val hdr = new String(bytes, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = le16(bytes, 6); val h = le16(bytes, 8)
    if (w <= 0 || h <= 0) return None
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) return None // no global color table
    val palSize = 1 << ((packed & 0x07) + 1)
    var i = 13
    if (i + 3 * palSize > bytes.length) return None
    val pal = Array.tabulate(palSize)(k => Array(
      bytes(i + 3 * k) & 0xff, bytes(i + 3 * k + 1) & 0xff,
      bytes(i + 3 * k + 2) & 0xff))
    i += 3 * palSize
    val frames = Seq.newBuilder[PngCodec.Image]
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x3b => // trailer
          val out = frames.result()
          return if (out.nonEmpty) Some(Gif(w, h, out)) else None
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < bytes.length && (bytes(i) & 0xff) != 0)
            i += 1 + (bytes(i) & 0xff)
          if (i >= bytes.length) return None
          i += 1
        case 0x2c =>
          if (i + 10 > bytes.length) return None
          val fx = le16(bytes, i + 1); val fy = le16(bytes, i + 3)
          val fw = le16(bytes, i + 5); val fh = le16(bytes, i + 7)
          val fpacked = bytes(i + 9) & 0xff
          // Out of profile: local table, interlace, partial frame.
          if ((fpacked & 0x80) != 0 || (fpacked & 0x40) != 0) return None
          if (fx != 0 || fy != 0 || fw != w || fh != h) return None
          i += 10
          if (i >= bytes.length) return None
          val minCode = bytes(i) & 0xff; i += 1
          val lzw = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && (bytes(i) & 0xff) != 0) {
            val n = bytes(i) & 0xff
            if (i + 1 + n > bytes.length) return None
            lzw.write(bytes, i + 1, n); i += 1 + n
          }
          if (i >= bytes.length) return None
          i += 1 // terminator
          val idx = lzwDecode(lzw.toByteArray, minCode, w * h)
            .getOrElse(return None)
          if (idx.length != w * h) return None
          val rgb = new Array[Byte](w * h * 3)
          var k = 0
          while (k < idx.length) {
            val pi = idx(k) & 0xff
            if (pi >= palSize) return None
            rgb(3 * k) = pal(pi)(0).toByte
            rgb(3 * k + 1) = pal(pi)(1).toByte
            rgb(3 * k + 2) = pal(pi)(2).toByte
            k += 1
          }
          frames += PngCodec.Image(w, h, 3, rgb)
        case _ => return None
      }
    }
    None // ran out without a trailer
  }
}
