package graft.operators

/** Pure-JVM BASELINE JPEG (ITU-T T.81 sequential DCT, Huffman) codec
  * in the [[PngCodec]] discipline: a spec-faithful DECODER for the
  * compressed pixel path (SOI/DQT/SOF0/SOF1/DHT/DRI/SOS marker
  * grammar, canonical Huffman entropy decode with byte stuffing and
  * restart markers, dequantize, 8×8 IDCT, nearest-neighbor chroma
  * upsample, YCbCr→RGB), plus a deliberately MINIMAL deterministic
  * encoder ([[encodeGrayDcOnly]]) that emits DC-only grayscale
  * scans under an all-ones quantization table — the shape whose
  * decode is CLOSED-FORM (every pixel of block b is exactly
  * `clamp(128 + dc(b)/8)` when dc is a multiple of 8), which is what
  * lets an oracle-checked query cover real JPEG bytes end to end.
  *
  * Scope contract (mirrors the public `jdk`/libjpeg baseline
  * profile): 8-bit precision, 1 or 3 components, Huffman coding.
  * Progressive (SOF2), arithmetic, hierarchical, and 12-bit streams
  * return None — [[Multimodal.decodePixels]] then falls through to
  * the JDK's ImageIO reader, exactly as before. The IDCT is the
  * textbook separable float transform (deterministic IEEE doubles on
  * every JVM); independent-implementation agreement with the JDK's
  * libjpeg-based reader is pinned in ImageIoCrossSpec (bit-exact on
  * DC-only scans, tight per-sample bounds on AC-bearing ones — the
  * spec allows IDCT implementations to differ by ±1/sample, and
  * chroma upsampling filters are explicitly decoder's choice).
  *
  * Reference behavior anchor: the reference service treats images as
  * opaque uploaded bytes (main.py:744-747); decoding is this engine's
  * scope extension, spec'd directly against T.81. */
object JpegCodec {

  /** zigzag index → natural (row-major) position. */
  private val Natural: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16), the separable IDCT basis. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private final case class Huff(maxcode: Array[Int], valptr: Array[Int],
                                mincode: Array[Int], vals: Array[Int])

  private def buildHuff(bits: Array[Int], vals: Array[Int]): Huff = {
    // canonical code assignment per T.81 Annex C
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      valptr(l) = k
      mincode(l) = code
      code += bits(l - 1)
      k += bits(l - 1)
      maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
      code <<= 1
      l += 1
    }
    Huff(maxcode, valptr, mincode, vals)
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    var atMarker = false
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) { atMarker = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
          if (b2 == 0x00) pos += 1 // stuffed literal FF
          else { atMarker = true; pos -= 1; return 0 }
        }
        cur = b; cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an RSTn marker if present. */
    def restart(): Boolean = {
      cnt = 0
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
          ((data(pos + 1) & 0xff) >= 0xd0 && (data(pos + 1) & 0xff) <= 0xd7)) {
        pos += 2; atMarker = false; true
      } else false
    }
  }

  private def huffDecode(r: BitReader, h: Huff): Int = {
    var code = r.nextBit()
    var l = 1
    while (code > h.maxcode(l)) {
      if (l >= 16 || r.atMarker) return 0
      code = (code << 1) | r.nextBit()
      l += 1
    }
    h.vals(h.valptr(l) + code - h.mincode(l))
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0
    var plane: Array[Int] = null
    var planeW = 0; var planeH = 0
    var pred = 0
  }

  /** Decode a baseline JPEG to a raster ([[PngCodec.Image]]:
    * 1 channel for grayscale, 3 for YCbCr). None when the bytes are
    * not a baseline Huffman JPEG this decoder covers. */
  def decode(bytes: Array[Byte]): Option[PngCodec.Image] = {
    try decodeImpl(bytes) catch { case _: Exception => None }
  }

  private def decodeImpl(data: Array[Byte]): Option[PngCodec.Image] = {
    if (data.length < 4 || (data(0) & 0xff) != 0xff ||
        (data(1) & 0xff) != 0xd8) return None
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    def u16(p: Int): Int = ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff)
    while (pos + 3 < data.length) {
      if ((data(pos) & 0xff) != 0xff) return None
      val marker = data(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => return None // EOI before any scan
        case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
          val len = u16(pos)
          val prec = data(pos + 2) & 0xff
          if (prec != 8) return None
          h = u16(pos + 3); w = u16(pos + 5)
          val n = data(pos + 7) & 0xff
          if (n != 1 && n != 3) return None
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          comps = Array.tabulate(n) { i =>
            val o = pos + 8 + i * 3
            Comp(data(o) & 0xff, (data(o + 1) & 0xff) >> 4,
              data(o + 1) & 0x0f, data(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4))
            return None
          pos += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // progressive / arithmetic / lossless: not ours
        case 0xc4 => // DHT (may hold several tables)
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tcth = data(p) & 0xff; p += 1
            val bits = Array.tabulate(16)(i => data(p + i) & 0xff)
            p += 16
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => data(p + i) & 0xff)
            p += nv
            val t = buildHuff(bits, vals)
            if ((tcth >> 4) == 0) dcT(tcth & 3) = t else acT(tcth & 3) = t
          }
          pos += len
        case 0xdb => // DQT (may hold several tables; 8- or 16-bit)
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pqtq = data(p) & 0xff; p += 1
            val table = new Array[Int](64)
            var i = 0
            while (i < 64) {
              table(i) =
                if ((pqtq >> 4) == 0) data(p) & 0xff
                else { val v = u16(p); p += 1; v }
              p += 1; i += 1
            }
            qt(pqtq & 3) = table
          }
          pos += len
        case 0xdd => restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xda => // SOS — the one scan baseline allows
          if (comps == null) return None
          val ns = data(pos + 2) & 0xff
          if (ns != comps.length) return None // non-interleaved: not ours
          var p = pos + 3
          var i = 0
          while (i < ns) {
            val cs = data(p) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.td = (data(p + 1) & 0xff) >> 4
            c.ta = data(p + 1) & 0x0f
            p += 2; i += 1
          }
          p += 3 // Ss, Se, AhAl (baseline: 0, 63, 0)
          return decodeScan(data, p, w, h, comps, qt, dcT, acT,
            restartInterval)
        case m if m >= 0xd0 && m <= 0xd7 => // stray RST outside scan
          ()
        case 0x01 => ()
        case _ => pos += u16(pos) // APPn/COM/DNL/…: skip by length
      }
    }
    None
  }

  private def decodeScan(data: Array[Byte], start: Int, w: Int, h: Int,
                         comps: Array[Comp], qt: Array[Array[Int]],
                         dcT: Array[Huff], acT: Array[Huff],
                         ri: Int): Option[PngCodec.Image] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
      if (qt(c.tq) == null) return None
    }
    val r = new BitReader(data, start)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!r.restart()) return None
          comps.foreach(_.pred = 0)
        }
        comps.foreach { c =>
          val dc = dcT(c.td); val ac = acT(c.ta)
          if (dc == null || ac == null) return None
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val s0 = huffDecode(r, dc)
              c.pred += extend(r.receive(s0), s0)
              coef(0) = c.pred * q(0)
              // AC
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = huffDecode(r, ac)
                val run = rs >> 4; val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 else eob = true
                } else {
                  k += run
                  if (k > 63) eob = true
                  else {
                    coef(Natural(k)) = extend(r.receive(size), size) * q(k)
                    k += 1
                  }
                }
              }
              if (r.atMarker && !(my == mcusY - 1 && mx == mcusX - 1))
                return None // truncated scan
              idct(coef, out)
              // land the block into the component plane
              val ox = (mx * c.h + bx) * 8
              val oy = (my * c.v + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val v = math.round(out(yy * 8 + xx) + 128.0).toInt
                  c.plane((oy + yy) * c.planeW + ox + xx) =
                    if (v < 0) 0 else if (v > 255) 255 else v
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // assemble: grayscale straight; color via nearest-neighbor chroma
    // upsample + YCbCr→RGB (the T.81/JFIF matrix)
    if (comps.length == 1) {
      val c = comps(0)
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = c.plane(y * c.planeW + x).toByte
          x += 1
        }
        y += 1
      }
      Some(PngCodec.Image(w, h, 1, px))
    } else {
      val px = new Array[Byte](w * h * 3)
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum = cy.plane(
            (y * cy.v / vmax) * cy.planeW + x * cy.h / hmax).toDouble
          val b0 = cb.plane(
            (y * cb.v / vmax) * cb.planeW + x * cb.h / hmax) - 128.0
          val r0 = cr.plane(
            (y * cr.v / vmax) * cr.planeW + x * cr.h / hmax) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val k = (y * w + x) * 3
          px(k) = clamp(lum + 1.402 * r0)
          px(k + 1) = clamp(lum - 0.344136 * b0 - 0.714136 * r0)
          px(k + 2) = clamp(lum + 1.772 * b0)
          x += 1
        }
        y += 1
      }
      Some(PngCodec.Image(w, h, 3, px))
    }
  }

  /** Separable 2-D inverse DCT (T.81 A.3.3, orthonormal scaling) —
    * deterministic IEEE doubles; a DC-only block short-circuits to
    * its exact constant dc/8. */
  private def idct(coef: Array[Int], out: Array[Double]): Unit = {
    var acZero = true
    var i = 1
    while (i < 64 && acZero) { if (coef(i) != 0) acZero = false; i += 1 }
    if (acZero) {
      java.util.Arrays.fill(out, coef(0) / 8.0)
      return
    }
    val tmp = new Array[Double](64)
    // rows: for each v-row of coefficients, transform along u → x
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * coef(y * 8 + u) * Cos(x)(u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // columns
    var x2 = 0
    while (x2 < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * tmp(v * 8 + x2) * Cos(y2)(v)
          v += 1
        }
        out(y2 * 8 + x2) = s / 2.0
        y2 += 1
      }
      x2 += 1
    }
  }

  // ------------------------------------------------------------------
  // Minimal deterministic encoder: DC-only grayscale, all-ones quant
  // ------------------------------------------------------------------

  /** Encode a DC-ONLY grayscale baseline JPEG: `w`/`h` multiples of 8,
    * one quantized DC coefficient per 8×8 block in raster block
    * order. Quantization table is ALL ONES, so any spec-compliant
    * decoder reconstructs block b as the constant
    * `clamp(round(dc(b)/8) + 128)` — EXACT (`128 + dc/8`) when dc is
    * a multiple of 8. That closed form is the oracle hook: a query
    * can derive dc values from table data, build real JPEG bytes,
    * decode them through the full marker/Huffman/IDCT path, and be
    * checked against plain SQL arithmetic. DC diffs are coded with a
    * minimal canonical table (categories 0..11 as 4-bit codes), AC
    * with a 1-bit EOB — both valid T.81 tables carried in the DHT
    * segment, so the bytes are self-contained for ANY decoder. */
  def encodeGrayDcOnly(w: Int, h: Int, dcs: Array[Int],
                       restartEvery: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"encodeGrayDcOnly: dims must be positive multiples of 8 ($w x $h)")
    val blocks = (w / 8) * (h / 8)
    require(dcs.length == blocks,
      s"encodeGrayDcOnly: expected $blocks DC values, got ${dcs.length}")
    require(dcs.forall(d => d > -1024 && d < 1024),
      "encodeGrayDcOnly: 8-bit baseline DC range is (-1024, 1024)")
    val o = new java.io.ByteArrayOutputStream()
    def b(x: Int): Unit = o.write(x & 0xff)
    def u16(x: Int): Unit = { b(x >> 8); b(x) }
    b(0xff); b(0xd8)                         // SOI
    b(0xff); b(0xdb); u16(67); b(0x00)       // DQT: Pq=0 Tq=0
    (0 until 64).foreach(_ => b(1))          //   all-ones
    b(0xff); b(0xc0); u16(11); b(8)          // SOF0: precision 8
    u16(h); u16(w); b(1)                     //   1 component
    b(1); b(0x11); b(0)                      //   id 1, 1x1, Tq 0
    b(0xff); b(0xc4); u16(2 + 1 + 16 + 12)   // DHT DC (Tc0,Th0)
    b(0x00)
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(b)                        //   12 four-bit codes
    (0 until 12).foreach(b)                  //   categories 0..11
    b(0xff); b(0xc4); u16(2 + 1 + 16 + 1)    // DHT AC (Tc1,Th0)
    b(0x10)
    b(1); (0 until 15).foreach(_ => b(0))    //   one 1-bit code
    b(0x00)                                  //   EOB
    if (restartEvery > 0) {                  // DRI
      b(0xff); b(0xdd); u16(4); u16(restartEvery)
    }
    b(0xff); b(0xda); u16(8); b(1)           // SOS: 1 component
    b(1); b(0x00)                            //   comp 1, Td0 Ta0
    b(0); b(63); b(0)                        //   Ss Se AhAl
    // entropy-coded data
    var cur = 0; var cnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); cnt += 1
        if (cnt == 8) {
          o.write(cur)
          if (cur == 0xff) o.write(0x00)     // byte stuffing
          cur = 0; cnt = 0
        }
        i -= 1
      }
    }
    var pred = 0
    var rst = 0
    dcs.zipWithIndex.foreach { case (dc, i) =>
      if (restartEvery > 0 && i > 0 && i % restartEvery == 0) {
        if (cnt > 0) putBits((1 << (8 - cnt)) - 1, 8 - cnt) // align
        b(0xff); b(0xd0 + rst); rst = (rst + 1) % 8         // RSTn
        pred = 0                                            // reset
      }
      val diff = dc - pred; pred = dc
      var cat = 0; var m = math.abs(diff)
      while (m != 0) { cat += 1; m >>= 1 }
      putBits(cat, 4)                        // DC category (4-bit code)
      if (cat > 0)
        putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      putBits(0, 1)                          // EOB
    }
    if (cnt > 0) putBits((1 << (8 - cnt)) - 1, 8 - cnt) // pad with 1s
    b(0xff); b(0xd9)                         // EOI
    o.toByteArray
  }
}
