package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.catalog.Catalog
import graft.extract.DeterministicExtractor
import graft.streaming.Ingest

/** CLI demo of the streaming ingest pipeline (reference main.py
  * §3.1 rebuilt): seeds a landing directory with sample "PDF"
  * documents, trains a folder from a master doc, runs one
  * Trigger.AvailableNow pass, and prints the resulting typed table.
  *
  * Usage: runMain graft.IngestDemo [workDir]
  * (workDir defaults to a fresh temp dir; rerunning with the same
  * workDir demonstrates checkpointed exactly-once — no duplicates.)
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      Files.createTempDirectory("graft-ingest-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def put(rel: String, body: String): Unit = {
      val p = Paths.get(root, "landing", rel)
      Files.createDirectories(p.getParent)
      if (!Files.exists(p)) Files.write(p, body.getBytes("UTF-8"))
    }
    put("incoming/acme/q1/batch/r1.pdf",
      "Revenue=$9,500.00\nDate=2024-03-31\nRegion=EMEA")
    put("incoming/acme/q1/batch/r2.pdf",
      "Revenue=(1,200)\nDate=April 2, 2024\nRegion=N/A")
    put("incoming/acme/q1/batch/junk.csv", "rejected by admission filter")
    // second folder in the SAME micro-batch (multi-folder batch path)
    put("incoming/acme/q2/batch/s1.pdf", "Headcount=1,250\nSite=Berlin")

    val meta = Catalog.train("acme", "q1", "quarterly report",
      Map("Revenue" -> "$1,000", "Date" -> "2024-01-01", "Region" -> "EMEA"))
    val meta2 = Catalog.train("acme", "q2", "sites",
      Map("Headcount" -> "1,000", "Site" -> "Berlin"))
    println(s"[demo] trained folder: " +
      meta.kpis.map(k => s"${k.columnName}:${k.logicalType}").mkString(", "))

    Ingest.start(spark, s"$root/landing", s"$root/wh", s"$root/proc",
      s"$root/cp", Catalog.empty.add(meta).add(meta2), DeterministicExtractor)
      .awaitTermination()

    println(s"[demo] table ${meta.tableName} after ingest:")
    Ingest.readTable(spark, s"$root/wh", meta)
      .orderBy("file_name").show(truncate = false)
    println(s"[demo] table ${meta2.tableName} after ingest:")
    Ingest.readTable(spark, s"$root/wh", meta2).show(truncate = false)
    println(s"[demo] archived r1: " + Files.exists(
      Paths.get(root, "proc/incoming/acme/q1/batch/r1.pdf")))
    println(s"[demo] junk.csv still in landing (rejected): " + Files.exists(
      Paths.get(root, "landing/incoming/acme/q1/batch/junk.csv")))
    println(s"[demo] workDir: $root (rerun with this arg to see exactly-once)")
    spark.stop()
  }
}
