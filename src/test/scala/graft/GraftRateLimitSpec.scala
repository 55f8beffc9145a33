package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Streaming admission control (maxFilesPerTrigger/maxBytesPerTrigger)
  * on the graft source: the initial snapshot drains across triggers,
  * totals stay exact across restarts mid-drain, and the legacy
  * unlimited offsets stay byte-compatible (limits can be turned on
  * over an existing checkpoint). */
class GraftRateLimitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-rate-$tag").toString + "/t"

  /** `n` more single-row files with ids starting at `from`. */
  private def mkFiles(dir: String, n: Int, from: Long = 0L): Unit =
    for (i <- 0 until n)
      SnapshotTable.append(Seq((from + i, s"v${from + i}")).toDF("id", "name")
        .coalesce(1), dir)

  private def runOnce(dir: String, ckpt: String, out: String,
                      options: Map[String, String],
                      batches: scala.collection.mutable.Buffer[Long]): Unit = {
    var reader = spark.readStream.format("graft")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.count()
        if (rows > 0) batches += rows
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
  }

  test("maxFilesPerTrigger drains the initial snapshot across triggers, " +
      "exactly once") {
    val dir = tmp("files"); mkFiles(dir, 7)
    val ckpt = Files.createTempDirectory("rate-ck").toString
    val out = Files.createTempDirectory("rate-out").toString + "/p"
    val batches = scala.collection.mutable.Buffer[Long]()
    runOnce(dir, ckpt, out, Map("maxFilesPerTrigger" -> "2"), batches)
    // 7 single-row files at 2 per trigger → 4 non-empty batches
    assert(batches.toSeq == Seq(2L, 2L, 2L, 1L), s"got $batches")
    val got = spark.read.parquet(out)
    assert(got.count() == 7)
    assert(got.select("id").distinct().count() == 7)
    // post-snapshot appends also admit under the budget
    mkFiles(dir, 3, from = 100L) // appended as v7..v9, one file each
    batches.clear()
    runOnce(dir, ckpt, out, Map("maxFilesPerTrigger" -> "2"), batches)
    assert(batches.sum == 3 && batches.forall(_ <= 2), s"got $batches")
    assert(spark.read.parquet(out).select("id").distinct().count() == 10)
  }

  test("restart mid-drain continues from the checkpoint, no dupes/gaps") {
    val dir = tmp("restart"); mkFiles(dir, 6)
    val ckpt = Files.createTempDirectory("rate-ck2").toString
    val out = Files.createTempDirectory("rate-out2").toString + "/p"
    // first run: ONE trigger only, then stop mid-drain
    var first: Option[Long] = None
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        first = Some(df.count())
        df.write.mode("append").parquet(out)
      }.start()
    q.awaitTermination()
    assert(first.contains(2L))
    // restart: drains the rest
    val batches = scala.collection.mutable.Buffer[Long]()
    runOnce(dir, ckpt, out, Map("maxFilesPerTrigger" -> "2"), batches)
    val got = spark.read.parquet(out)
    assert(got.count() == 6)
    assert(got.select("id").distinct().count() == 6)
  }

  test("maxBytesPerTrigger admits at least one file per trigger") {
    val dir = tmp("bytes"); mkFiles(dir, 4)
    val ckpt = Files.createTempDirectory("rate-ck3").toString
    val out = Files.createTempDirectory("rate-out3").toString + "/p"
    val batches = scala.collection.mutable.Buffer[Long]()
    // 1-byte budget: every file is over budget alone — one per trigger
    runOnce(dir, ckpt, out, Map("maxBytesPerTrigger" -> "1"), batches)
    assert(batches.toSeq == Seq(1L, 1L, 1L, 1L), s"got $batches")
    assert(spark.read.parquet(out).count() == 4)
  }

  test("turning limits ON over an unlimited checkpoint continues cleanly") {
    val dir = tmp("flip"); mkFiles(dir, 3)
    val ckpt = Files.createTempDirectory("rate-ck4").toString
    val out = Files.createTempDirectory("rate-out4").toString + "/p"
    val b1 = scala.collection.mutable.Buffer[Long]()
    runOnce(dir, ckpt, out, Map.empty, b1)      // unlimited: 1 batch of 3
    assert(b1.toSeq == Seq(3L))
    mkFiles(dir, 4, from = 100L)
    val b2 = scala.collection.mutable.Buffer[Long]()
    runOnce(dir, ckpt, out, Map("maxFilesPerTrigger" -> "1"), b2)
    assert(b2.toSeq == Seq(1L, 1L, 1L, 1L), s"got $b2")
    val got = spark.read.parquet(out)
    assert(got.count() == 7)
    assert(got.select("id").distinct().count() == 7)
  }
}
