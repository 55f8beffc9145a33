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

  /** Compact a small-files parquet directory (ONE partition leaf —
    * run per partition on a partitioned table) into ~`targetBytes`
    * files. Streaming sinks append one file per micro-batch per task:
    * after a day a hot partition holds thousands of KB-scale files,
    * and every downstream scan pays per-file open/footer/schedule cost
    * — the classic lakehouse small-files problem. Rewrite = one narrow
    * coalesce (no shuffle: file count shrinks, rows don't move between
    * surviving partitions' lineage) into a sibling temp dir; then the
    * swap moves ONLY the files captured in the initial listing aside
    * and the rewritten files in — the live directory always exists,
    * and a file APPENDED CONCURRENTLY (a racing micro-batch) is
    * neither read nor touched: it simply survives to the next
    * compaction. Returns (filesBefore, filesAfter).
    *
    * Consistency contract (a plain filesystem has no manifest — this
    * is exactly the gap table formats close with one): a reader racing
    * the swap can transiently see a PARTIAL listing (some originals
    * gone, rewrite not yet visible); a crash mid-swap leaves the
    * originals recoverable in the sibling `.<name>_compact_old` dir,
    * never silently duplicated. Run it from the partition's single
    * writer/janitor; point-in-time readers need a manifest format.
    *
    * No-op (returns counts, writes nothing) when the directory already
    * has ≤ the target file count — compaction must be safe to schedule
    * blindly from a janitor loop. "Blindly" includes after a crash: a
    * re-run that finds a non-empty trash dir ABORTS (it cannot tell
    * moved-aside-only from already-swapped, so deleting or restoring
    * could lose or duplicate rows) and demands manual recovery. */
  def compactSmallFiles(spark: SparkSession, path: String,
                        targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}_compact_tmp")
    val trash = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}_compact_old")
    // A NON-EMPTY trash dir means a prior run crashed mid-swap and the
    // files in it may be the only copy of their rows (crash during the
    // originals→trash loop) — or duplicates of rows already swapped in
    // (crash during the rewrite→live loop). The two are not
    // distinguishable without a manifest, so a fresh run must never
    // delete it: abort and require manual adjudication. An empty trash
    // (clean shutdown raced the final delete) is safe to clear. This
    // check runs BEFORE the no-op early return — a crash after the
    // rewrite→live move leaves the live dir already compact, and that
    // "clean-looking" state is exactly the one that must still abort.
    if (fs.exists(trash) && fs.listStatus(trash).exists(_.isFile))
      throw new java.io.IOException(
        s"compact: $trash is non-empty — a prior compaction crashed " +
        "mid-swap; inspect and restore/remove its files manually " +
        "before re-running")
    def liveFiles() = fs.listStatus(p).filter(s => s.isFile
      && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val files = liveFiles()
    val totalBytes = files.map(_.getLen).sum
    val nTarget = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (files.length <= nTarget) return (files.length, files.length)
    fs.delete(tmp, true); fs.delete(trash, true)
    // Rewrite exactly the files of the initial listing (a concurrent
    // append after this point must NOT be folded in — it would then be
    // double-counted when the swap leaves it in place). coalesce, not
    // repartition: merging files needs no row movement. mergeSchema:
    // an appended leaf may hold files with EVOLVED schemas (O16) —
    // resolving from one footer would silently drop the columns the
    // other files carry; reading every footer is fine here (the dir is
    // exactly the small-files set being compacted).
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(_.getPath.toString): _*).coalesce(nTarget)
      .write.mode("overwrite").parquet(tmp.toString)
    // Swap: originals → trash (only the listed ones), rewrite → live.
    fs.mkdirs(trash)
    files.foreach { f =>
      if (!fs.rename(f.getPath, new org.apache.hadoop.fs.Path(trash, f.getPath.getName)))
        throw new java.io.IOException(s"compact: cannot move ${f.getPath} aside")
    }
    fs.listStatus(tmp).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_")).foreach { f =>
        if (!fs.rename(f.getPath, new org.apache.hadoop.fs.Path(p, f.getPath.getName)))
          throw new java.io.IOException(s"compact: cannot move ${f.getPath} into place")
      }
    fs.delete(trash, true); fs.delete(tmp, true)
    (files.length, liveFiles().length)
  }

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
