package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for the 100 TB design point (SURVEY.md §4):
  * data partitioned by (tenant, folder) — the reference's per-table
  * granularity (main.py:262-264) — plus a time partition so the
  * dominant access patterns become partition pruning:
  *
  *   - per-tenant reads touch `uid=<x>/` only;
  *   - time-ranged queries (the reference's newest-first top-k) touch
  *     recent `day=` partitions only, and parquet min/max row-group
  *     stats prune inside them.
  *
  * Writers keep partitions append-friendly (no global sort); file
  * sizing is governed by spark.sql.files.maxPartitionBytes on read and
  * AQE coalescing on write.
  */
object Warehouse {

  /** Append `df` under `path` partitioned by the given columns
    * (Hive-style key=value directories). */
  def appendPartitioned(df: DataFrame, path: String,
                        partitionCols: Seq[String]): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** Append an events-shaped table partitioned by day(ts). */
  def appendEventsByDay(events: DataFrame, path: String): Unit =
    appendPartitioned(
      events.withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
      path, Seq("day"))

  /** Read a partitioned table; predicates on partition columns become
    * partition pruning (directories never listed into the scan),
    * asserted in ScaleOpsSpec. `mergeSchema` is OPT-IN: merging reads
    * every file's footer at schema-resolution time — before partition
    * pruning can drop anything — which at the 100 TB design point is a
    * full listing per read. Default reads resolve the schema from one
    * footer; pass mergeSchema = true only for evolved tables whose
    * union schema genuinely differs across files. */
  def read(spark: SparkSession, path: String,
           mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema.toString).parquet(path)
}
