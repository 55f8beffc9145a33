package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.sources.Warehouse

/** CLI demo of the scale-infrastructure operators: salted skew join
  * (result parity + partition spread) and the day-partitioned
  * warehouse layout (partition pruning visible in the plan).
  *
  * Usage: runMain graft.ScaleDemo
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- salted skew join: 90% of fact rows on one hot key -------------
    val fact = (1 to 100000).map { i =>
      (if (i % 10 == 0) s"t${i % 7}" else "hot", i.toLong)
    }.toDF("tenant", "v")
    val dim = Seq(("hot", "HOT"), ("t0", "A"), ("t1", "B"), ("t3", "C"))
      .toDF("tenant", "name")
    val plain = fact.join(dim, "tenant").agg(count(lit(1)), sum("v")).first()
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "tenant", salts = 8)
      .agg(count(lit(1)), sum("v")).first()
    println(s"[scale] plain join:  rows=${plain.getLong(0)} sum=${plain.getLong(1)}")
    println(s"[scale] salted join: rows=${salted.getLong(0)} sum=${salted.getLong(1)}")
    println(s"[scale] parity: ${plain == salted}")

    // --- day-partitioned warehouse + pruning ---------------------------
    val dir = Files.createTempDirectory("scale-demo-wh").toString
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 11:00:00"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 12:00:00"), 3.0))
      .toDF("event_id", "ts", "value")
    Warehouse.appendEventsByDay(events, dir)
    val pruned = Warehouse.read(spark, dir).filter(col("day") === "2024-01-02")
    pruned.show()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        s"selectedPartitions=${f.selectedPartitions.partitionCount} " +
          s"(of 3 written); partitionFilters=${f.partitionFilters.mkString(",")}"
    }
    println(s"[scale] pruning: ${scan.getOrElse("scan node not found")}")
    spark.stop()
  }
}
