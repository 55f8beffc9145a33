package graft.operators

/** REAL video codec for the one video container that needs no native
  * library: YUV4MPEG2 (the mjpegtools/ffmpeg interchange format —
  * plain-text stream header, then uncompressed planar frames each
  * prefixed by a `FRAME` line). Parsing is pure byte arithmetic, so
  * frame demux/sampling — the video operation the multimodal pipeline
  * declares — runs for REAL here: [[Multimodal.sampledFrames]] takes
  * this path for Y4M payloads and keeps the byte-window stub only for
  * containers that genuinely need a demuxer library (MP4/MKV).
  *
  * Supported profile: C444 (one full byte per channel per pixel —
  * frame payload is exactly 3*W*H bytes) and C420 variants
  * (W*H + 2*(W/2)*(H/2)); frame headers with parameters are accepted
  * and ignored. Anything malformed decodes to None, never a partial
  * frame list.
  */
object Y4mCodec {

  /** Demuxed stream: planar frames in stream order, each `frameSize`
    * bytes (Y plane first — callers computing luma stats read the
    * first width*height bytes). */
  final case class Video(width: Int, height: Int, fpsNum: Int,
                         fpsDen: Int, colorspace: String,
                         frames: Seq[Array[Byte]])

  private def frameBytes(w: Int, h: Int, cs: String): Option[Int] = cs match {
    case "C444" => Some(3 * w * h)
    case "C420" | "C420jpeg" | "C420paldv" | "C420mpeg2" =>
      if (w % 2 == 0 && h % 2 == 0) Some(w * h + 2 * (w / 2) * (h / 2))
      else None
    case _ => None // C422 etc: out of profile
  }

  /** Serialize: `YUV4MPEG2 W<w> H<h> F<n>:<d> <cs>\n` then
    * `FRAME\n<payload>` per frame — byte-faithful to the public
    * format, readable by ffmpeg. */
  def encode(video: Video): Array[Byte] = {
    val size = frameBytes(video.width, video.height, video.colorspace)
      .getOrElse(throw new IllegalArgumentException(
        s"unsupported colorspace ${video.colorspace} at " +
          s"${video.width}x${video.height}"))
    video.frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == size,
        s"frame $i has ${f.length} bytes, expected $size")
    }
    val header = s"YUV4MPEG2 W${video.width} H${video.height} " +
      s"F${video.fpsNum}:${video.fpsDen} ${video.colorspace}\n"
    val o = new java.io.ByteArrayOutputStream(
      header.length + video.frames.size * (6 + size))
    o.write(header.getBytes("US-ASCII"))
    video.frames.foreach { f =>
      o.write("FRAME\n".getBytes("US-ASCII"))
      o.write(f)
    }
    o.toByteArray
  }

  /** Header-only dimension sniff — O(header), no frame copies; the
    * cheap form `media_dims`-style scans want. None on bad magic or
    * missing/invalid W/H. */
  def sniffDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    if (bytes.length < magic.length ||
        !magic.indices.forall(i => bytes(i) == magic(i))) return None
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    var w = -1; var h = -1
    new String(bytes, 0, nl, "US-ASCII").split(' ').drop(1).foreach { p =>
      if (p.nonEmpty) p.head match {
        case 'W' => w = p.tail.toIntOption.getOrElse(-1)
        case 'H' => h = p.tail.toIntOption.getOrElse(-1)
        case _ => ()
      }
    }
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** Parse + demux. None for a bad magic, missing W/H, out-of-profile
    * colorspace, a malformed FRAME marker, or a truncated final
    * frame. */
  def decode(bytes: Array[Byte]): Option[Video] = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    if (bytes.length < magic.length ||
        !magic.indices.forall(i => bytes(i) == magic(i))) return None
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(bytes, 0, nl, "US-ASCII")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "C420"
    header.split(' ').drop(1).foreach { p =>
      if (p.nonEmpty) p.head match {
        case 'W' => w = p.tail.toIntOption.getOrElse(-1)
        case 'H' => h = p.tail.toIntOption.getOrElse(-1)
        case 'F' => p.tail.split(':') match {
          case Array(a, b) =>
            fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
          case _ => return None
        }
        case 'C' => cs = p
        case _ => () // interlacing/aspect/params: accepted, ignored
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val size = frameBytes(w, h, cs).getOrElse(return None)
    val frames = Seq.newBuilder[Array[Byte]]
    var i = nl + 1
    while (i < bytes.length) {
      // FRAME line: "FRAME" + optional space-led params + '\n'.
      val m = "FRAME".getBytes("US-ASCII")
      if (i + m.length > bytes.length ||
          !m.indices.forall(k => bytes(i + k) == m(k))) return None
      var j = i + m.length
      while (j < bytes.length && bytes(j) != '\n') {
        if (bytes(j) != ' ' && bytes(j) != 'I' && bytes(j) != 'X' &&
            !bytes(j).toChar.isLetterOrDigit && bytes(j) != ':' &&
            bytes(j) != '=') return None
        j += 1
      }
      if (j >= bytes.length) return None // no newline
      val start = j + 1
      if (start + size > bytes.length) return None // truncated frame
      frames += java.util.Arrays.copyOfRange(bytes, start, start + size)
      i = start + size
    }
    Some(Video(w, h, fn, fd, cs, frames.result()))
  }
}
