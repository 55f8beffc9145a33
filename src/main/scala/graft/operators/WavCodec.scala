package graft.operators

/** REAL audio codec for the one mainstream format that needs no
  * native library: WAV/RIFF with integer PCM payloads (the Microsoft
  * RIFF container + WAVEFORMAT structure, both public). Everything is
  * little-endian byte arithmetic — parse the RIFF chunk list, read
  * `fmt ` (PCM, 16-bit, 1-2 channels), slice `data` into interleaved
  * samples — so decode/resample/encode are deterministic and
  * oracle-checkable, the audio analog of [[PngCodec]]. Compressed
  * audio (MP3/AAC/FLAC) genuinely needs codec libraries absent from
  * this build and stays behind [[Multimodal.StubCodec]].
  *
  * Like every codec here, it only ever runs inside batched
  * `mapPartitions` — per-row byte work that distributes with the
  * data; no sample buffer crosses an executor boundary.
  */
object WavCodec {

  /** Decoded PCM clip: `samples` is interleaved per frame
    * (L R L R ... for stereo), 16-bit signed. */
  final case class Clip(sampleRate: Int, channels: Int,
                       samples: Array[Short]) {
    require(channels == 1 || channels == 2, s"channels must be 1|2: $channels")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels")
    def frames: Int = samples.length / channels
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def wle16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def wle32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }

  /** Serialize as canonical PCM WAV: RIFF/WAVE + 16-byte `fmt ` +
    * `data`, 16-bit little-endian samples. Byte-exact given the same
    * clip — no entropy coder involved. */
  def encode(clip: Clip): Array[Byte] = {
    require(clip.samples.length <= (Int.MaxValue - 64) / 2,
      s"clip too large to serialize: ${clip.samples.length} samples")
    val dataBytes = clip.samples.length * 2
    val o = new java.io.ByteArrayOutputStream(44 + dataBytes)
    o.write("RIFF".getBytes("US-ASCII"))
    wle32(o, 36L + dataBytes)
    o.write("WAVE".getBytes("US-ASCII"))
    o.write("fmt ".getBytes("US-ASCII"))
    wle32(o, 16L)
    wle16(o, 1) // PCM
    wle16(o, clip.channels)
    wle32(o, clip.sampleRate.toLong)
    wle32(o, clip.sampleRate.toLong * clip.channels * 2) // byte rate
    wle16(o, clip.channels * 2) // block align
    wle16(o, 16) // bits per sample
    o.write("data".getBytes("US-ASCII"))
    wle32(o, dataBytes.toLong)
    clip.samples.foreach(s => wle16(o, s & 0xffff))
    o.toByteArray
  }

  /** Parse a RIFF/WAVE buffer: walk the chunk list (chunks are
    * word-aligned — odd-sized chunks carry a pad byte, spec'd since
    * RIFF 1.0), require a PCM 16-bit `fmt ` before `data`. None for
    * anything else — truncations, float/compressed formats, >2
    * channels — never a partial clip. */
  def decode(bytes: Array[Byte]): Option[Clip] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
          bytes(10) == 'V' && bytes(11) == 'E')) return None
    var rate = 0; var channels = 0; var haveFmt = false
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val len = le32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = le16(bytes, i + 8)
          channels = le16(bytes, i + 10)
          rate = le32(bytes, i + 12).toInt
          val bits = le16(bytes, i + 22)
          if (audioFormat != 1 || bits != 16 ||
              (channels != 1 && channels != 2) || rate <= 0) return None
          haveFmt = true
        case "data" =>
          if (!haveFmt) return None
          val n = (len / 2).toInt
          if (n.toLong * 2 != len) return None // odd data length: malformed PCM16
          if (n % channels != 0) return None
          val samples = new Array[Short](n)
          var k = 0
          while (k < n) {
            samples(k) = le16(bytes, i + 8 + 2 * k).toShort
            k += 1
          }
          return Some(Clip(rate, channels, samples))
        case _ => () // LIST/INFO and friends: skipped
      }
      i += 8 + len.toInt + (len.toInt & 1) // word alignment pad
    }
    None
  }

  /** Integer downsample by decimation: keep every `factor`-th FRAME
    * (all channels of it), sample rate divides accordingly. Exact —
    * no interpolation, so the oracle states `i → factor*i` in closed
    * form. (A production resampler would low-pass first; decimation
    * is the deterministic contract the query surface pins.) */
  def decimate(clip: Clip, factor: Int): Clip = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    require(clip.sampleRate % factor == 0,
      s"sampleRate ${clip.sampleRate} not divisible by $factor")
    val keptFrames = (clip.frames + factor - 1) / factor
    val out = new Array[Short](keptFrames * clip.channels)
    var f = 0
    while (f < keptFrames) {
      var c = 0
      while (c < clip.channels) {
        out(f * clip.channels + c) =
          clip.samples(f * factor * clip.channels + c)
        c += 1
      }
      f += 1
    }
    Clip(clip.sampleRate / factor, clip.channels, out)
  }

  /** Exact integer statistics of a clip — the aggregate the
    * oracle-checked query states in SQL: per-clip frame count, peak
    * absolute amplitude, and the exact sum of squares (Long — 16-bit
    * samples square to <=2^30, so even 2^33 samples fit). */
  def stats(clip: Clip): (Long, Long, Long) = {
    var peak = 0L; var sumSq = 0L
    clip.samples.foreach { s =>
      val v = s.toLong
      if (math.abs(v) > peak) peak = math.abs(v)
      sumSq += v * v
    }
    (clip.frames.toLong, peak, sumSq)
  }
}
