package graft.operators

/** REAL MP4 / ISO base-media (ISO 14496-12) METADATA sniffing — box
  * structures are plain big-endian byte arithmetic, so track
  * dimensions and duration parse without any codec: walk the box
  * tree, read `mvhd` (timescale + duration) and the video `tkhd`
  * (16.16 fixed-point width/height). Frame DECODE genuinely needs an
  * H.264/H.265 codec and stays out of scope — this is the video
  * analog of the JPEG SOFn header walk: real container metadata,
  * stub pixels. The encoder twin emits a minimal spec-faithful box
  * tree (ftyp + mvhd/tkhd inside moov) for specs and fixtures.
  *
  * Profile: version-0 and version-1 mvhd/tkhd, 32-bit box sizes plus
  * the `size==1` 64-bit largesize escape; truncated or malformed
  * trees → None, never fabricated metadata. */
object Mp4Meta {

  /** (width, height, durationMs) of the first sized track. */
  final case class Meta(width: Int, height: Int, durationMs: Long)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, "US-ASCII")

  /** Walk children of [from, until); invoke f(type, bodyFrom,
    * bodyUntil); false on malformed framing. */
  private def walk(b: Array[Byte], from: Int, until: Int,
                   f: (String, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i < until) {
      if (i + 8 > until) return false
      val size32 = be32(b, i)
      val (size, hdr) =
        if (size32 == 1) {
          if (i + 16 > until) return false
          (be64(b, i + 8), 16)
        } else if (size32 == 0) ((until - i).toLong, 8) // box runs to end
        else (size32, 8)
      if (size < hdr || i + size > until) return false
      if (!f(boxType(b, i), i + hdr, i + size.toInt)) return false
      i += size.toInt
    }
    true
  }

  /** Parse metadata; None outside the profile or on malformed
    * framing. The file must open with an `ftyp` box (the standard
    * brand signature). */
  def sniff(b: Array[Byte]): Option[Meta] = {
    if (b.length < 12 || boxType(b, 0) != "ftyp") return None
    var timescale = 0L; var duration = -1L
    var w = 0; var h = 0
    val ok = walk(b, 0, b.length, { (typ, from, until) =>
      typ match {
        case "moov" =>
          walk(b, from, until, { (t2, f2, u2) =>
            t2 match {
              case "mvhd" =>
                if (u2 - f2 < 4) false
                else {
                  val ver = b(f2) & 0xff
                  if (ver == 0 && u2 - f2 >= 20) {
                    timescale = be32(b, f2 + 12); duration = be32(b, f2 + 16)
                    true
                  } else if (ver == 1 && u2 - f2 >= 32) {
                    timescale = be32(b, f2 + 20); duration = be64(b, f2 + 24)
                    true
                  } else false
                }
              case "trak" =>
                walk(b, f2, u2, { (t3, f3, u3) =>
                  if (t3 != "tkhd") true
                  else if (u3 - f3 < 8 || (b(f3) & 0xff) > 1) false
                  else {
                    // width/height are the LAST 8 bytes (16.16 fixed)
                    // in both versions.
                    val tw = (be32(b, u3 - 8) >> 16).toInt
                    val th = (be32(b, u3 - 4) >> 16).toInt
                    if (w == 0 && tw > 0 && th > 0) { w = tw; h = th }
                    true
                  }
                })
              case _ => true
            }
          })
        case _ => true // ftyp/mdat/free: skip
      }
    })
    if (!ok || timescale <= 0 || duration < 0 || w <= 0 || h <= 0 ||
        duration > Long.MaxValue / 1000L) None
    else Some(Meta(w, h, duration * 1000L / timescale))
  }

  /** Minimal spec-faithful encoder twin: ftyp + moov(mvhd, trak(tkhd))
    * + an empty mdat. Version-0 boxes; width/height as 16.16 fixed
    * point; duration in `timescale` units. */
  def encode(width: Int, height: Int, durationMs: Long,
             timescale: Long = 1000L): Array[Byte] = {
    require(width > 0 && height > 0 && durationMs >= 0 && timescale > 0,
      s"bad mp4 meta: ${width}x$height ${durationMs}ms @$timescale")
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val duration = durationMs * timescale / 1000L
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      new Array[Byte](12) ++ // version/flags + creation/modification
        be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ // rate, volume, pad
        new Array[Byte](8) ++ // reserved
        (Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
          .flatMap(be32).toArray) ++ // identity matrix
        new Array[Byte](24) ++ be32(2)) // predefined + next track id
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 3) ++ // version 0, flags: enabled+in-movie
        new Array[Byte](8) ++ be32(1) ++ new Array[Byte](4) ++ // track id
        be32(duration) ++ new Array[Byte](16) ++ // duration, reserved+layer
        (Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
          .flatMap(be32).toArray) ++
        be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov ++ box("mdat", Array.emptyByteArray)
  }
}
