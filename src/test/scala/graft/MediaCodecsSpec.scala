package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, WavCodec, Y4mCodec}

/** The pure-JVM WAV (RIFF/PCM16) and Y4M (YUV4MPEG2) codecs: round
  * trips, chunk-walk details a naive parser gets wrong (padding,
  * extra chunks, frame params), malformed rejection, decimation
  * arithmetic, and the real demux path through
  * [[Multimodal.sampledFrames]]. */
class MediaCodecsSpec extends AnyFunSuite {

  private def mix(i: Long): Int = {
    var x = i * 0x9e3779b97f4a7c15L
    x ^= x >>> 32; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 29
    (x & 0xffff).toInt - 0x8000
  }

  // ---------------------------------------------------------------- WAV

  test("WAV round trip: mono and stereo, odd frame counts") {
    for {
      ch <- Seq(1, 2)
      frames <- Seq(1, 7, 1000, 1023)
    } {
      val clip = WavCodec.Clip(44100, ch,
        Array.tabulate(frames * ch)(i => mix(i + ch * 31L).toShort))
      val back = WavCodec.decode(WavCodec.encode(clip))
        .getOrElse(fail(s"decode failed ch=$ch frames=$frames"))
      assert(back.sampleRate == 44100 && back.channels == ch)
      assert(back.samples.toSeq == clip.samples.toSeq)
    }
  }

  test("WAV decode survives extra chunks and odd-length padding") {
    // A LIST chunk of ODD size before fmt/data: the walk must apply
    // the RIFF word-alignment pad or it desynchronizes.
    val clip = WavCodec.Clip(8000, 1, Array.tabulate(16)(i => (i * 3).toShort))
    val good = WavCodec.encode(clip)
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes: odd
    val o = new java.io.ByteArrayOutputStream()
    o.write(good, 0, 12) // RIFF header + WAVE
    o.write("LIST".getBytes("US-ASCII"))
    o.write(Array[Byte](5, 0, 0, 0)) // LE size 5
    o.write(listBody); o.write(0) // pad byte
    o.write(good, 12, good.length - 12) // fmt + data as-is
    val back = WavCodec.decode(o.toByteArray).getOrElse(fail("padded walk"))
    assert(back.samples.toSeq == clip.samples.toSeq)
  }

  test("WAV malformed inputs reject") {
    val good = WavCodec.encode(
      WavCodec.Clip(8000, 1, Array.tabulate(8)(_.toShort)))
    assert(WavCodec.decode(good).isDefined)
    Seq(4, 12, 20, 43).foreach { n =>
      assert(WavCodec.decode(good.take(n)).isEmpty, s"truncated at $n")
    }
    // data chunk claiming more bytes than present.
    val lying = good.clone()
    lying(43) = 0x7f // data size high byte
    assert(WavCodec.decode(lying).isEmpty)
    // Non-PCM format code.
    val floaty = good.clone()
    floaty(20) = 3 // IEEE float
    assert(WavCodec.decode(floaty).isEmpty)
    // Wrong magic.
    val notRiff = good.clone(); notRiff(0) = 'X'
    assert(WavCodec.decode(notRiff).isEmpty)
  }

  test("WAV decimation keeps every factor-th frame, both channels") {
    val stereo = WavCodec.Clip(48000, 2,
      Array.tabulate(20)(i => (i * 10).toShort)) // frames: (0,10),(20,30),...
    val half = WavCodec.decimate(stereo, 2)
    assert(half.sampleRate == 24000 && half.frames == 5)
    assert(half.samples.toSeq ==
      Seq(0, 10, 40, 50, 80, 90, 120, 130, 160, 170).map(_.toShort))
    val (n, peak, sumSq) = WavCodec.stats(half)
    assert(n == 5 && peak == 170)
    assert(sumSq == half.samples.map(s => s.toLong * s).sum)
    // factor 1 is identity.
    assert(WavCodec.decimate(stereo, 1).samples.toSeq == stereo.samples.toSeq)
  }

  test("property: random clips round-trip; decimation == reference slice (seeded gen)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      ch <- Gen.oneOf(1, 2)
      frames <- Gen.chooseNum(1, 700)
      rate <- Gen.oneOf(8000, 16000, 44100, 48000)
      factor <- Gen.oneOf(1, 2, 4)
      seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield (ch, frames, rate, factor, seed)
    val cases = (0 until 50)
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 40)
    cases.foreach { case (ch, frames, rate, factor, seed) =>
      val clip = WavCodec.Clip(rate, ch,
        Array.tabulate(frames * ch)(i => mix(seed + i).toShort))
      val back = WavCodec.decode(WavCodec.encode(clip)).getOrElse(
        fail(s"decode failed ch=$ch n=$frames"))
      assert(back.samples.toSeq == clip.samples.toSeq &&
        back.sampleRate == rate && back.channels == ch)
      val dec = WavCodec.decimate(clip, factor)
      val ref = (0 until frames by factor).flatMap(f =>
        (0 until ch).map(c => clip.samples(f * ch + c)))
      assert(dec.samples.toSeq == ref, s"decimate ch=$ch n=$frames x$factor")
      assert(dec.sampleRate == rate / factor)
    }
  }

  // ---------------------------------------------------------------- Y4M

  private def vid(w: Int, h: Int, n: Int, cs: String,
                  seed: Long): Y4mCodec.Video = {
    val size = if (cs == "C444") 3 * w * h else w * h + 2 * (w / 2) * (h / 2)
    Y4mCodec.Video(w, h, 30, 1, cs,
      (0 until n).map(f => Array.tabulate(size)(i =>
        (mix(seed + f * 1000L + i) & 0xff).toByte)))
  }

  test("Y4M round trip: C444 and C420, multiple frame counts") {
    for {
      cs <- Seq("C444", "C420")
      n <- Seq(0, 1, 5)
    } {
      val v = vid(6, 4, n, cs, n * 17L)
      val back = Y4mCodec.decode(Y4mCodec.encode(v))
        .getOrElse(fail(s"decode failed cs=$cs n=$n"))
      assert(back.width == 6 && back.height == 4 && back.colorspace == cs)
      assert(back.frames.size == n)
      back.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq)
      }
    }
  }

  test("Y4M accepts FRAME parameters and header extras; rejects malformed") {
    // Hand-built stream with interlacing/aspect params and a FRAME
    // param — all legal, all ignored.
    val frame = Array.tabulate(12)(_.toByte) // 2x2 C444
    val txt = "YUV4MPEG2 W2 H2 F24:1 Ip A1:1 C444 XYSCSS=444\n"
    val bytes = txt.getBytes("US-ASCII") ++
      "FRAME Ixyz\n".getBytes("US-ASCII") ++ frame
    val v = Y4mCodec.decode(bytes).getOrElse(fail("param-laden stream"))
    assert(v.width == 2 && v.frames.size == 1 &&
      v.frames.head.toSeq == frame.toSeq)
    // Truncated final frame must reject the whole stream.
    assert(Y4mCodec.decode(bytes.dropRight(1)).isEmpty)
    // Bad magic / missing dims / odd C420 dims.
    assert(Y4mCodec.decode("JUNK".getBytes("US-ASCII")).isEmpty)
    assert(Y4mCodec.decode("YUV4MPEG2 W0 H2 C444\nFRAME\n"
      .getBytes("US-ASCII")).isEmpty)
    assert(Y4mCodec.decode("YUV4MPEG2 W3 H3 C420\n"
      .getBytes("US-ASCII")).isEmpty)
    // Garbage where a FRAME marker should be.
    val junkFrame = txt.getBytes("US-ASCII") ++
      "FARME\n".getBytes("US-ASCII") ++ frame
    assert(Y4mCodec.decode(junkFrame).isEmpty)
  }

  test("MP4 box-tree metadata sniffs for real; malformed trees reject") {
    import graft.operators.Mp4Meta
    val bytes = Mp4Meta.encode(1920, 1080, durationMs = 90500)
    val m = Mp4Meta.sniff(bytes).getOrElse(fail("sniff failed"))
    assert(m.width == 1920 && m.height == 1080 && m.durationMs == 90500)
    // Multimodal.decode picks it up as real video metadata.
    val meta = Multimodal.decode("video", bytes)
    assert(meta.format == "video/mp4" && meta.width == 1920 &&
      meta.height == 1080)
    // Odd timescale: duration converts through it.
    val b2 = Mp4Meta.encode(640, 360, durationMs = 2000, timescale = 90000)
    assert(Mp4Meta.sniff(b2).get.durationMs == 2000)
    // Truncations and bad framing reject.
    Seq(4, 11, 30, bytes.length - 3).foreach { n =>
      assert(Mp4Meta.sniff(bytes.take(n)).isEmpty, s"truncated at $n")
    }
    val notFtyp = bytes.clone(); notFtyp(4) = 'x'
    assert(Mp4Meta.sniff(notFtyp).isEmpty)
    // A box claiming a size beyond the buffer rejects (no overread).
    val lying = bytes.clone(); lying(0) = 0x7f
    assert(Mp4Meta.sniff(lying).isEmpty)
  }

  test("sampledFrames takes the real Y4M demux path; stub preserved for others") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rows = (0L until 10L).map { id =>
      val v = vid(4, 4, 9, "C444", id * 7L)
      Multimodal.MediaRow(id,
        Multimodal.MediaMeta("video", "video/y4m", 4, 4, 0L),
        Y4mCodec.encode(v))
    }
    val kept = Multimodal.sampledFrames(
        spark.createDataset(rows), frameSize = 48, stride = 4)
      .collect().groupBy(_.media_id)
    (0L until 10L).foreach { id =>
      val frames = kept(id).sortBy(_.frame_idx)
      assert(frames.length == 3, s"id=$id: stride 4 over 9 keeps 0,4,8")
      val src = vid(4, 4, 9, "C444", id * 7L)
      frames.zip(Seq(0, 4, 8)).foreach { case (f, srcIdx) =>
        assert(f.frame.toSeq == src.frames(srcIdx).toSeq, s"id=$id src=$srcIdx")
      }
    }
    // Non-Y4M bytes: stub fixed-window path, unchanged contract.
    val stub = Multimodal.sampledFrames(
      spark.createDataset(Seq(Multimodal.MediaRow(99L,
        Multimodal.MediaMeta("video", "fake/pcm", 0, 0, 12L),
        Array.tabulate[Byte](12)(_.toByte)))), frameSize = 4, stride = 2)
      .collect()
    assert(stub.length == 2) // windows 0..3 and 8..11
    assert(stub.map(_.frame.toSeq).toSet ==
      Set(Seq[Byte](0, 1, 2, 3), Seq[Byte](8, 9, 10, 11)))
    // And metadata decode recognizes Y4M for real.
    val meta = Multimodal.decode("video", Y4mCodec.encode(vid(4, 4, 2, "C420", 1L)))
    assert(meta.format == "video/y4m" && meta.width == 4 && meta.height == 4)
  }
}
