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
