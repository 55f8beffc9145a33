package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video travel through the
  * engine as opaque `binary` columns plus a typed metadata struct —
  * the bytes are only ever touched inside batched per-partition
  * decoders, never row-at-a-time on the driver.
  *
  * The actual media codecs are NOT part of the engine (and the image/
  * audio libraries are not in this build); [[StubCodec]] is the
  * clearly-marked deterministic stand-in. Everything around it —
  * schema, Dataset encoders, mapPartitions batch shape, partition
  * sizing notes — is the real 100 TB plumbing: a production codec
  * drops in by replacing one function.
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

  /** STUB CODEC — deterministic stand-in for image/audio decode.
    * A real implementation would parse the container format; this one
    * fabricates plausible metadata from the byte length so tests are
    * reproducible without media libraries. Replace [[StubCodec.decode]]
    * to integrate a real codec. */
  object StubCodec {
    def decode(kind: String, content: Array[Byte]): MediaMeta = {
      // ??? <- real codec goes here; deterministic fake below.
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
        MediaRow(id, StubCodec.decode("image", bytes), bytes)
      }
  }

  /** Distributed resize: every media row through the (stub) codec's
    * resample, batched per partition — map-only, zero shuffle; the
    * bytes never leave the executor. */
  def resized(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      val (m2, b2) = StubCodec.resize(row.meta, row.content, w, h)
      MediaRow(row.media_id, m2, b2)
    })
  }

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Distributed frame sampling: one media row fans out to its kept
    * frames (video → keyframe extraction shape). Output rows are
    * small; downstream per-frame work partitions freely. */
  def sampledFrames(media: Dataset[MediaRow], frameSize: Int,
                    stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      StubCodec.sampleFrames(row.content, frameSize, stride)
        .zipWithIndex.map { case (f, i) => Frame(row.media_id, i, f) }
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
