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

  /** Write `df` as a BUCKETED catalog table: rows are hash-distributed
    * into `nBuckets` files per partition by `bucketCol` and sorted by
    * it within each bucket. Two tables bucketed the same way join on
    * the bucket column with NO shuffle on either side (and no sort,
    * since buckets are pre-sorted) — the co-located-join layout for
    * fact↔fact joins where neither side is broadcastable and the join
    * key is stable (e.g. orders ⋈ lineitem on the order key at the
    * 100 TB design point, re-joined by every downstream query).
    * Pick nBuckets so one bucket ≈ 100-200 MB at the target scale;
    * it must MATCH across tables meant to co-join (Spark only elides
    * the shuffle when bucket specs agree). Asserted shuffle-free in
    * ScaleOpsSpec.
    *
    * Bucketing metadata lives in the session catalog (saveAsTable) —
    * path-based parquet reads don't carry it. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, path: Option[String] = None): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
