package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.StubCodec

/** Multimodal plumbing tests: the codec is a stub, but the schema,
  * encoders, batch shape, and byte statistics are real. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table carries opaque bytes + typed metadata") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = Multimodal.asMediaTable(docs)
    val row = media.filter(_.media_id == 0L).head()
    assert(row.meta.kind == "image")
    assert(row.meta.nBytes == row.content.length.toLong)
    assert(row.meta.width >= 16 && row.meta.height >= 16)
    assert(media.count() == docs.count())
  }

  test("extractFeatures byte stats equal string stats on ASCII fixture") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(20)
    val feats = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    docs.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = r.getAs[String]("text")
      val f = feats(id)
      assert(f.n_bytes == text.length.toLong)
      assert(f.cnt_a == text.count(_ == 'a').toLong)
      assert(f.cnt_space == text.count(_ == ' ').toLong)
      assert(f.mean_byte == text.map(_.toInt).sum.toDouble / text.length)
    }
  }

  test("distributed resize and frame sampling run map-only over the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(50)
    val media = Multimodal.asMediaTable(docs)
    val small = Multimodal.resized(media, 8, 8).collect()
    assert(small.length == 50)
    small.foreach { r =>
      assert(r.meta.width == 8 && r.meta.height == 8)
      assert(r.meta.nBytes == r.content.length.toLong)
    }
    val frames = Multimodal.sampledFrames(media, frameSize = 64, stride = 2)
    val byDoc = frames.collect().groupBy(_.media_id)
    assert(byDoc.size == 50)
    val orig = media.collect().map(m => m.media_id -> m.content).toMap
    byDoc.foreach { case (id, fs) =>
      val expected = (math.ceil(orig(id).length / 64.0).toInt + 1) / 2
      assert(fs.length == expected, s"doc $id: ${fs.length} frames vs $expected")
      assert(fs.head.frame.toSeq == orig(id).slice(0, 64).toSeq)
    }
  }

  test("ImageCodec parses hand-built PNG/JPEG/GIF/BMP headers") {
    // PNG signature+IHDR assembled BY HAND (not via ImageHeaders — an
    // encoder/decoder pair sharing a layout bug would self-verify):
    // width 307 (0x133), height 259 (0x103), big-endian u32s.
    val png = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d,                         // IHDR len 13
      0x49, 0x48, 0x44, 0x52,                         // "IHDR"
      0x00, 0x00, 0x01, 0x33,                         // width  307
      0x00, 0x00, 0x01, 0x03,                         // height 259
      0x08, 0x02, 0x00, 0x00, 0x00).map(_.toByte)
    val pm = Multimodal.ImageCodec.sniff(png).get
    assert((pm.format, pm.width, pm.height) == ("image/png", 307, 259))

    // JPEG: SOI, then a COM segment the walker must skip, then SOF2
    // (progressive — any non-C4/C8/CC SOFn must match): h=0x0210=528,
    // w=0x0301=769.
    val jpg = Array(
      0xff, 0xd8,                                     // SOI
      0xff, 0xfe, 0x00, 0x04, 0x41, 0x42,             // COM len 4 "AB"
      0xff, 0xc2, 0x00, 0x0b, 0x08,                   // SOF2 len 11 prec 8
      0x02, 0x10, 0x03, 0x01,                         // h 528, w 769
      0x01, 0x01, 0x11, 0x00,
      0xff, 0xd9).map(_.toByte)
    val jm = Multimodal.ImageCodec.sniff(jpg).get
    assert((jm.format, jm.width, jm.height) == ("image/jpeg", 769, 528))

    // GIF87a (the older signature variant): little-endian u16s,
    // w=0x0102=258, h=0x0021=33.
    val gif = ("GIF87a".getBytes("US-ASCII") ++ Array(
      0x02, 0x01, 0x21, 0x00, 0x00, 0x00, 0x00).map(_.toByte))
    val gm = Multimodal.ImageCodec.sniff(gif).get
    assert((gm.format, gm.width, gm.height) == ("image/gif", 258, 33))

    // BMP with NEGATIVE height (top-down row order): dims still
    // (640, 480). Little-endian i32s at offsets 18/22.
    def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
    val bmp = "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++
      le32(54) ++ le32(40) ++ le32(640) ++ le32(-480) ++
      Array[Byte](1, 0, 24, 0) ++ Array.fill[Byte](24)(0)
    val bm = Multimodal.ImageCodec.sniff(bmp).get
    assert((bm.format, bm.width, bm.height) == ("image/bmp", 640, 480))
  }

  test("ImageCodec rejects malformed bytes; decode falls back to the stub") {
    val IC = Multimodal.ImageCodec
    // Truncations of valid headers must return None, never garbage.
    val full = Multimodal.ImageHeaders.png(10, 10)
    (0 until 24).foreach { n =>
      assert(IC.sniff(full.take(n)).isEmpty, s"png truncated at $n")
    }
    assert(IC.sniff(Multimodal.ImageHeaders.jpeg(10, 10).take(6)).isEmpty)
    // JPEG with EOI before any SOF: no frame header, no dims.
    assert(IC.sniff(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // Zero-dimension PNG is invalid per spec.
    val z = Multimodal.ImageHeaders.png(1, 1)
    java.util.Arrays.fill(z, 16, 24, 0.toByte)
    assert(IC.sniff(z).isEmpty)
    // Unrecognized bytes: decode() degrades to the deterministic stub.
    val text = "just some text".getBytes("UTF-8")
    assert(Multimodal.decode("image", text) == StubCodec.decode("image", text))
  }

  test("ImageHeaders round-trip through ImageCodec across the dim range") {
    for ((w, h) <- Seq((1, 1), (255, 256), (1000, 800), (65535, 65535))) {
      val cases = Seq(
        "image/png" -> Multimodal.ImageHeaders.png(w, h),
        "image/jpeg" -> Multimodal.ImageHeaders.jpeg(w, h),
        "image/gif" -> Multimodal.ImageHeaders.gif(w, h),
        "image/bmp" -> Multimodal.ImageHeaders.bmp(w, h))
      for ((fmt, bytes) <- cases) {
        val m = Multimodal.ImageCodec.sniff(bytes).get
        assert((m.format, m.width, m.height, m.nBytes) ==
          (fmt, w, h, bytes.length.toLong), s"$fmt ${w}x$h")
      }
    }
    // PNG chunk CRCs are REAL: corrupting the IHDR payload must break
    // the stored CRC (checked with java.util.zip, the reference impl).
    val p = Multimodal.ImageHeaders.png(12, 34)
    val body = p.slice(12, 29) // "IHDR" + 13-byte payload
    val crc = new java.util.zip.CRC32(); crc.update(body)
    val stored = ((p(29) & 0xffL) << 24) | ((p(30) & 0xffL) << 16) |
      ((p(31) & 0xffL) << 8) | (p(32) & 0xffL)
    assert(stored == crc.getValue)
  }

  test("stub resize keeps the (meta, bytes) contract") {
    val bytes = Array.tabulate(1000)(_.toByte)
    val meta = StubCodec.decode("image", bytes)
    val (m2, b2) = StubCodec.resize(meta, bytes, 8, 8)
    assert(m2.width == 8 && m2.height == 8)
    assert(m2.nBytes == b2.length.toLong)
    assert(b2.length <= bytes.length && b2.length >= 1)
  }

  test("stub frame sampling keeps every stride-th frame") {
    val bytes = Array.tabulate(100)(_.toByte)
    val frames = StubCodec.sampleFrames(bytes, frameSize = 10, stride = 3)
    assert(frames.length == 4) // frames 0,3,6,9 of 10
    assert(frames.head.toSeq == bytes.slice(0, 10).toSeq)
    assert(frames(1).toSeq == bytes.slice(30, 40).toSeq)
  }
}
