package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video travel through the
  * engine as opaque `binary` columns plus a typed metadata struct —
  * the bytes are only ever touched inside batched per-partition
  * decoders, never row-at-a-time on the driver.
  *
  * Codec reality, by layer: container HEADERS parse for real across
  * PNG/JPEG/GIF/BMP ([[ImageCodec]]); PIXELS decode/resample/encode
  * for real for PNG's 8-bit gray/RGB profile via the pure-JDK
  * [[PngCodec]] (zlib inflate + spec §9 unfiltering); only the
  * codecs that genuinely need native media libraries absent from
  * this build (JPEG DCT, video demux, audio PCM) remain behind the
  * clearly-marked deterministic [[StubCodec]]. Everything around
  * them — schema, Dataset encoders, mapPartitions batch shape,
  * partition sizing notes — is the real 100 TB plumbing: a further
  * production codec drops in by replacing one function.
  *
  * Scale notes: media rows are large (MBs); keep
  * spark.sql.files.maxPartitionBytes at its default 128 MB so a
  * partition holds tens of rows, and never collect content columns.
  * Feature extraction is map-only (zero shuffle); joins against
  * feature/embedding tables are equi-joins on the media id.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque bytes. */
  final case class MediaMeta(kind: String, format: String,
                             width: Int, height: Int, nBytes: Long)

  final case class MediaRow(media_id: Long, meta: MediaMeta,
                            content: Array[Byte])

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 cnt_a: Long, cnt_space: Long,
                                 mean_byte: Double)

  /** REAL container-header codec: format + pixel dimensions parsed
    * from the magic bytes of the four classic raster containers, by
    * their public specifications — PNG (ISO 15948 §5.2/§11.2.2: 8-byte
    * signature, IHDR width/height as big-endian u32), JPEG/JFIF (ITU
    * T.81 §B: marker-segment walk to the first SOFn frame header,
    * height/width as big-endian u16), GIF (GIF89a spec: logical screen
    * width/height as little-endian u16 at offset 6), and BMP
    * (BITMAPINFOHEADER: signed little-endian i32 at offsets 18/22,
    * height negative for top-down rows). Pure byte arithmetic — no
    * media libraries — so it is deterministic and oracle-checkable;
    * pixel DECODING (IDAT inflate, DCT) is what stays behind
    * [[StubCodec]]. Returns None for anything that is not a
    * well-formed header of these formats (truncated buffers included):
    * a malformed file must fall through to quarantine handling, never
    * fabricate dimensions. */
  object ImageCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

    def sniff(b: Array[Byte]): Option[MediaMeta] =
      png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(bmp(b))

    private def png(b: Array[Byte]): Option[MediaMeta] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      if (b.length >= 24 && sig.indices.forall(i => u8(b, i) == sig(i)) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(MediaMeta("image", "image/png", w.toInt, h.toInt, b.length.toLong))
        else None
      } else None
    }

    private def jpeg(b: Array[Byte]): Option[MediaMeta] = {
      if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      // Marker-segment walk: every segment is FF <marker> [len16 data],
      // where len includes its own 2 bytes; standalone markers (RSTn,
      // TEM) carry no length. The first SOFn (C0-CF minus the
      // non-frame C4/C8/CC) holds precision(1) height(2) width(2).
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None
        val m = u8(b, i + 1)
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
        else if (m == 0xd9) return None // EOI before any frame header
        else {
          val len = be16(b, i + 2)
          if (len < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 >= b.length) return None
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            return if (w > 0 && h > 0)
              Some(MediaMeta("image", "image/jpeg", w, h, b.length.toLong))
            else None
          }
          i += 2 + len
        }
      }
      None
    }

    private def gif(b: Array[Byte]): Option[MediaMeta] = {
      val ok = b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'
      if (!ok) return None
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0)
        Some(MediaMeta("image", "image/gif", w, h, b.length.toLong))
      else None
    }

    private def bmp(b: Array[Byte]): Option[MediaMeta] = {
      if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
      val hdrSize = le32(b, 14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
      val w = le32(b, 18); val h = le32(b, 22)
      if (w > 0 && h != 0) // negative height = top-down row order
        Some(MediaMeta("image", "image/bmp", w, math.abs(h), b.length.toLong))
      else None
    }
  }

  /** Minimal-but-well-formed container headers for the four formats
    * [[ImageCodec]] parses — the encoder twin used by the declared
    * query (q_media_dims) and the specs. Each is byte-faithful to its
    * public spec (PNG chunks carry REAL CRC-32s over type+data; JPEG
    * wraps the SOF0 in a standard JFIF APP0 so the parser must walk a
    * non-frame segment first), just with no pixel payload — dimensions
    * live entirely in the header, which is the point. */
  object ImageHeaders {
    private def crc32(bytes: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32(); c.update(bytes); c.getValue
    }
    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** 45 bytes: signature + IHDR (8-bit truecolor) + IEND. */
    def png(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"png dims must be positive: ${w}x$h")
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      val ihdrBody = "IHDR".getBytes("US-ASCII") ++ be32(w.toLong) ++
        be32(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0)
      val iendBody = "IEND".getBytes("US-ASCII")
      sig ++ be32(13) ++ ihdrBody ++ be32(crc32(ihdrBody)) ++
        be32(0) ++ iendBody ++ be32(crc32(iendBody))
    }

    /** 35 bytes: SOI + JFIF APP0 + grayscale SOF0 + EOI. */
    def jpeg(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
        s"jpeg dims must fit u16: ${w}x$h")
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
      val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
        Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](1, 1, 0x11, 0)
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }

    /** 14 bytes: GIF89a logical screen descriptor + trailer. */
    def gif(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
        s"gif dims must fit u16: ${w}x$h")
      "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0, 0, 0, 0x3b)
    }

    /** 54 bytes: BITMAPFILEHEADER + BITMAPINFOHEADER (24bpp), no
      * pixel array. */
    def bmp(w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"bmp dims must be positive: ${w}x$h")
      "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        Array.fill[Byte](24)(0)
    }
  }

  /** Decode media metadata: REAL header parsing where the bytes are a
    * recognized container — PNG/JPEG/GIF/BMP via [[ImageCodec.sniff]],
    * YUV4MPEG2 streams via [[Y4mCodec]] (genuine frame dimensions) —
    * deterministic [[StubCodec]] fallback for everything else (the
    * text-as-bytes fixture, unknown formats). */
  def decode(kind: String, content: Array[Byte]): MediaMeta =
    ImageCodec.sniff(content)
      .orElse(Y4mCodec.sniffDims(content).map { case (w, h) =>
        MediaMeta("video", "video/y4m", w, h, content.length.toLong) })
      .orElse(Mp4Meta.sniff(content).map(m =>
        MediaMeta("video", "video/mp4", m.width, m.height,
          content.length.toLong)))
      .getOrElse(StubCodec.decode(kind, content))

  /** STUB CODEC — deterministic stand-in for the pixel decodes that
    * genuinely need native libraries (JPEG DCT, video demux, audio
    * PCM). Container HEADERS are parsed for real by [[ImageCodec]];
    * PNG pixels decode for real via [[PngCodec]]. Fabricates
    * plausible metadata from the byte length so tests stay
    * reproducible for the remaining formats. */
  object StubCodec {
    def decode(kind: String, content: Array[Byte]): MediaMeta = {
      val n = content.length
      MediaMeta(kind, if (kind == "image") "fake/bmp" else "fake/pcm",
        width = 16 + (n % 64), height = 16 + (n % 48), nBytes = n.toLong)
    }

    /** STUB resize: a real codec would resample pixels; the stand-in
      * truncates bytes proportionally to the AREA ratio (double math —
      * integer division would floor any downscale ratio to 0) and
      * rewrites metadata, preserving the (bytes, meta) contract the
      * pipeline relies on. Upscales keep all bytes. */
    def resize(meta: MediaMeta, content: Array[Byte],
               w: Int, h: Int): (MediaMeta, Array[Byte]) = {
      val ratio = (w.toDouble * h) / math.max(1.0, meta.width.toDouble * meta.height)
      val keep = math.max(1, math.min(content.length,
        math.round(content.length * math.min(1.0, ratio)).toInt))
      (meta.copy(width = w, height = h, nBytes = keep.toLong),
        content.take(keep))
    }

    /** STUB frame sampling: treats the payload as fixed-size frames
      * and keeps every `stride`-th — the real version would seek
      * keyframes. */
    def sampleFrames(content: Array[Byte], frameSize: Int,
                     stride: Int): Seq[Array[Byte]] =
      content.grouped(frameSize).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }.toSeq
  }

  /** Wrap a text corpus as a media table (UTF-8 bytes as the opaque
    * payload) — deterministic fixture used by tests and the declared
    * query; real media lands the same shape via the binaryFile source. */
  def asMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        MediaRow(id, decode("image", bytes), bytes)
      }
  }

  /** Full pixel decode, exact codecs first: PNG (inflate + unfilter,
    * [[PngCodec]]) and GIF (LZW, [[GifCodec]]) are bit-exact and
    * spec-pinned; everything else — JPEG, TIFF, WBMP — falls through
    * to the JDK's own ImageIO readers ([[ImageIoCodec]], public Java
    * SE API, with the documented lossy-format determinism caveat).
    * None only when no codec claims the bytes. */
  def decodePixels(content: Array[Byte]): Option[PngCodec.Image] =
    PngCodec.decode(content)
      .orElse(GifCodec.decode(content).map(_.frames.head))
      .orElse(JpegCodec.decode(content))
      .orElse(ImageIoCodec.decode(content))

  /** Distributed resize: every media row through the codec's
    * resample, batched per partition — map-only, zero shuffle; the
    * bytes never leave the executor. Any decodable raster takes the
    * REAL path ([[decodePixels]]: exact PNG/GIF codecs, then the
    * JDK's ImageIO readers for JPEG/TIFF) through the integer
    * box-average resample; output re-encodes as PNG regardless of
    * input format (the lossless normalization a pipeline wants after
    * a resample). Undecodable payloads fall back to the documented
    * [[StubCodec]] byte-truncation stand-in. */
  def resized(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      decodePixels(row.content) match {
        case Some(img) =>
          val bytes = PngCodec.encode(PngCodec.resizeBox(img, w, h))
          MediaRow(row.media_id,
            MediaMeta("image", "image/png", w, h, bytes.length.toLong), bytes)
        case None =>
          val (m2, b2) = StubCodec.resize(row.meta, row.content, w, h)
          MediaRow(row.media_id, m2, b2)
      }
    })
  }

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Distributed frame sampling: one media row fans out to its kept
    * frames (video → keyframe extraction shape). Y4M payloads take
    * the REAL demux path ([[Y4mCodec]] planar frames), animated GIFs
    * take the REAL decode path ([[GifCodec]] LZW → RGB frames) —
    * every `stride`-th frame kept, frameSize coming from the
    * container (the argument is ignored); other payloads fall back
    * to the documented fixed-window [[StubCodec]]. Output rows are
    * small; downstream per-frame work partitions freely. */
  def sampledFrames(media: Dataset[MediaRow], frameSize: Int,
                    stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      val real: Option[Seq[Array[Byte]]] =
        Y4mCodec.decode(row.content).map(_.frames)
          .orElse(GifCodec.decode(row.content)
            .map(_.frames.map(_.pixels))) // animated GIF: RGB planes
      val frames = real match {
        case Some(fs) => fs.zipWithIndex
          .collect { case (f, i) if i % stride == 0 => f }
        case None => StubCodec.sampleFrames(row.content, frameSize, stride)
      }
      frames.zipWithIndex.map { case (f, i) => Frame(row.media_id, i, f) }
    }
  }

  /** Batched per-partition feature extraction (the mapInPandas analog:
    * one JVM-side pass per partition, vectorizable per batch, no
    * per-row scheduling overhead). The features themselves are real
    * byte statistics, so this path has an exact DuckDB oracle on the
    * text fixture. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val b = row.content
        var cntA = 0L; var cntSp = 0L; var sum = 0L
        var i = 0
        while (i < b.length) {
          val v = b(i) & 0xff
          if (v == 'a') cntA += 1
          if (v == ' ') cntSp += 1
          sum += v
          i += 1
        }
        MediaFeatures(row.media_id, b.length.toLong, cntA, cntSp,
          if (b.length == 0) 0.0 else sum.toDouble / b.length)
      }
    }
  }
}
