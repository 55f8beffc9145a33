package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-committed table format — the consistency layer the
  * plain-directory warehouse documents itself as lacking
  * ([[Warehouse.compactSmallFiles]]: "a reader racing the swap can
  * transiently see a PARTIAL listing ... point-in-time readers need a
  * manifest format"). This is that format, reduced to the essentials
  * the 100 TB design point needs and nothing else:
  *
  *   - **A table is a sequence of versioned manifests**
  *     (`_manifests/v<N>.json`), each the COMPLETE list of data files
  *     (relative paths under `data/`) of that snapshot. Readers never
  *     list `data/` — they read one manifest, then exactly those
  *     files. A reader therefore sees every snapshot fully or not at
  *     all: no partial listings, ever.
  *   - **Commits are atomic** via create-exclusive of the next
  *     manifest file (create(overwrite=false) is the filesystem CAS;
  *     HDFS and POSIX both give it). Two racing committers both
  *     prepare their file lists; one wins v<N>, the loser observes the
  *     conflict and RETRIES the commit against v<N> (append = re-union
  *     file lists, no data rewrite — optimistic concurrency, the
  *     Delta/Iceberg commit loop in miniature).
  *   - **Appends write data files FIRST, then commit.** A crash
  *     between the two leaves orphan files invisible to every reader
  *     (the manifest never references them) — cleaned by [[vacuum]],
  *     never double-counted.
  *   - **Compaction is a new snapshot, not a swap**: rewritten files
  *     are added, superseded files dropped from the NEW manifest only.
  *     Readers of older versions keep reading the old files
  *     ([[snapshot]] time travel) until [[vacuum]] retires them —
  *     compaction can never race a reader.
  *
  * Deliberately out of scope (and documented as such): column-level
  * stats/pruning inside a snapshot (parquet footers still provide
  * row-group pruning), schema evolution metadata (pair with
  * [[graft.catalog.Catalog]]), and multi-table transactions. */
object SnapshotTable {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(dir, "_manifests")
  private def manifestPath(dir: String, v: Long) =
    new Path(manifestDir(dir), s"v$v.json")

  /** Latest committed version, or None for an empty/uninitialized
    * table. One directory listing of `_manifests/` — never of the
    * data. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) return None
    val vs = f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def manifestText(spark: SparkSession, dir: String, v: Long): String = {
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The file list of a version (relative paths). */
  def manifestFiles(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val txt = manifestText(spark, dir, v)
    // One string array; hand-rolled parse keeps the zero-dep rule.
    // The slice to the files bracket keeps the txns section's strings
    // out of the match.
    "\"([^\"]+)\"".r.findAllMatchIn(
      txt.substring(txt.indexOf('['), txt.indexOf(']') + 1))
      .map(_.group(1)).toSeq
  }

  /** Highest committed transaction version per writer app id (the
    * exactly-once ledger [[transactionalAppend]] checks). */
  def manifestTxns(spark: SparkSession, dir: String, v: Long): Map[String, Long] = {
    val txt = manifestText(spark, dir, v)
    val i = txt.indexOf("\"txns\":{")
    if (i < 0) return Map.empty
    val seg = txt.substring(i + 8, txt.indexOf('}', i))
    "\"([^\"]+)\":(-?\\d+)".r.findAllMatchIn(seg)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** Serializes same-JVM committers. Commit atomicity rests on a
    * rename-that-fails-if-destination-exists — which HDFS-class
    * stores give and the LOCAL filesystem does NOT (Hadoop's local
    * create/rename are check-then-act; POSIX rename overwrites).
    * That is precisely the public "LogStore" contract of
    * manifest-log formats: multi-PROCESS commits need a store with
    * an atomic no-overwrite publish; on local filesystems this JVM
    * lock makes multi-THREAD commits (the local[32] reality) exact,
    * and cross-process local commits remain best-effort. */
  private val commitLock = new Object

  /** Try to commit `files` as version `v`. True iff this writer won
    * the publish race for v<N>. Content-atomic: the body is fully
    * written to a hidden temp file, then renamed into place — a
    * reader can never observe a partially-written manifest. */
  private def tryCommit(spark: SparkSession, dir: String, v: Long,
                        files: Seq[String],
                        txns: Map[String, Long] = Map.empty): Boolean =
      commitLock.synchronized {
    val f = fs(spark, dir)
    f.mkdirs(manifestDir(dir))
    val target = manifestPath(dir, v)
    if (f.exists(target)) return false
    val txnBody = txns.toSeq.sorted
      .map { case (a, tv) => "\"" + a + "\":" + tv }.mkString("{", ",", "}")
    val body = files.sorted.map(p => "\"" + p + "\"")
      .mkString(s"""{"version":$v,"txns":$txnBody,"files":[""", ",", "]}")
    val tmp = new Path(manifestDir(dir),
      s".v$v.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val ok = try f.rename(tmp, target)
    catch { case _: java.io.IOException => false }
    if (!ok) f.delete(tmp, false)
    ok
  }

  /** Append `df` as a new snapshot: write data files under a unique
    * subdir of `data/`, then commit previous files + new files with
    * the optimistic retry loop. Returns the committed version. */
  def append(df: DataFrame, dir: String, maxRetries: Int = 20): Long = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    // Unique batch subdir: no two writers can collide on data paths,
    // so data writes need no coordination at all.
    val batch = java.util.UUID.randomUUID().toString
    val batchDir = new Path(dir, s"data/$batch")
    df.write.parquet(batchDir.toString)
    val added = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/$batch/${s.getPath.getName}")
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(spark, dir)
      val prev = base.map(manifestFiles(spark, dir, _)).getOrElse(Nil)
      val txns = base.map(manifestTxns(spark, dir, _)).getOrElse(Map.empty)
      val v = base.getOrElse(-1L) + 1
      if (tryCommit(spark, dir, v, prev ++ added, txns)) return v
      attempt += 1 // lost the race: re-read the new latest and retry
    }
    throw new java.io.IOException(
      s"append: lost the commit race $maxRetries times under $dir")
  }

  /** EXACTLY-ONCE append for replayable writers (the Structured
    * Streaming foreachBatch contract): the manifest carries a
    * per-`appId` high-water transaction version, and a commit whose
    * `txnVersion` is not strictly above the recorded one is a NO-OP
    * (returns None, its data files left as vacuumable orphans). A
    * retried micro-batch therefore lands its rows exactly once no
    * matter how many times the batch replays — the idempotent-sink
    * half of Structured Streaming's end-to-end guarantee, which the
    * plain parquet `mode("append")` sinks in this repo explicitly
    * lack (their contract is at-least-once + downstream dedup).
    * Monotonicity check and commit happen under the same optimistic
    * loop, so two replays racing each other still commit once. */
  def transactionalAppend(df: DataFrame, dir: String, appId: String,
                          txnVersion: Long,
                          maxRetries: Int = 20): Option[Long] = {
    require(appId.nonEmpty, "transactionalAppend: appId must be non-empty")
    val spark = df.sparkSession
    val f = fs(spark, dir)
    // Cheap pre-check saves the data write on the common replay path;
    // the authoritative check re-runs inside the commit loop.
    val pre = latestVersion(spark, dir)
      .map(manifestTxns(spark, dir, _)).getOrElse(Map.empty)
    if (pre.getOrElse(appId, Long.MinValue) >= txnVersion) return None
    val batch = java.util.UUID.randomUUID().toString
    val batchDir = new Path(dir, s"data/$batch")
    df.write.parquet(batchDir.toString)
    val added = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/$batch/${s.getPath.getName}")
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(spark, dir)
      val prev = base.map(manifestFiles(spark, dir, _)).getOrElse(Nil)
      val txns = base.map(manifestTxns(spark, dir, _)).getOrElse(Map.empty)
      if (txns.getOrElse(appId, Long.MinValue) >= txnVersion)
        return None // a racing replay won; our files stay orphaned
      val v = base.getOrElse(-1L) + 1
      if (tryCommit(spark, dir, v, prev ++ added,
          txns + (appId -> txnVersion))) return Some(v)
      attempt += 1
    }
    throw new java.io.IOException(
      s"transactionalAppend: lost the commit race $maxRetries times under $dir")
  }

  /** Read a snapshot: the latest by default, or a pinned `version`
    * (time travel). The scan reads EXACTLY the manifest's files — a
    * concurrent append/compaction/vacuum of later versions is
    * invisible. An uninitialized table is an error (no schema to
    * return). */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, dir)).getOrElse(
      throw new java.io.IOException(s"read: no committed version under $dir"))
    val files = manifestFiles(spark, dir, v)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(p => s"$dir/$p"): _*)
  }

  /** Compact the CURRENT snapshot's small files into ~targetBytes
    * files, committed as a new version whose manifest drops the
    * superseded files and adds the rewritten ones. Old versions stay
    * fully readable (their files are untouched until [[vacuum]]).
    * If an append commits concurrently, the commit loop re-bases:
    * files added since the compaction read are carried forward
    * unchanged — only the files actually rewritten are swapped out.
    * Returns the new version, or None when already compact. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              maxRetries: Int = 20): Option[Long] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val f = fs(spark, dir)
    val base = latestVersion(spark, dir).getOrElse(
      throw new java.io.IOException(s"compact: no committed version under $dir"))
    val old = manifestFiles(spark, dir, base)
    if (old.isEmpty) return None
    val totalBytes = old.map(p => f.getFileStatus(new Path(dir, p)).getLen).sum
    val nTarget = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (old.length <= nTarget) return None
    val batch = java.util.UUID.randomUUID().toString
    val batchDir = new Path(dir, s"data/$batch")
    spark.read.parquet(old.map(p => s"$dir/$p"): _*)
      .coalesce(nTarget).write.parquet(batchDir.toString)
    val rewritten = f.listStatus(batchDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/$batch/${s.getPath.getName}")
    var attempt = 0
    while (attempt < maxRetries) {
      val cur = latestVersion(spark, dir).get
      val curFiles = manifestFiles(spark, dir, cur)
      // Re-base: keep files that appeared after our read; drop only
      // the ones we actually rewrote. The txn ledger carries forward
      // untouched — compaction commits no writer transaction.
      val next = curFiles.filterNot(old.toSet) ++ rewritten
      if (tryCommit(spark, dir, cur + 1, next,
          manifestTxns(spark, dir, cur))) return Some(cur + 1)
      attempt += 1
    }
    throw new java.io.IOException(
      s"compact: lost the commit race $maxRetries times under $dir")
  }

  /** Retire data files referenced by NO manifest among the latest
    * `keepVersions` (orphans from crashed appends included), and drop
    * the manifests older than that window. Time travel shrinks to the
    * kept window; the latest snapshot is never touched. `minAgeMs`
    * guards the append-in-flight race: a writer that has written data
    * files but not yet committed its manifest looks exactly like a
    * crashed append, so only unreferenced files older than the age
    * floor are deleted — pick it longer than any plausible
    * write-to-commit gap (the Delta retention discipline). Returns
    * the number of data files deleted. */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int = 2,
             minAgeMs: Long = 60L * 60 * 1000): Int = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val f = fs(spark, dir)
    val latest = latestVersion(spark, dir).getOrElse(return 0)
    val keepFrom = math.max(0L, latest - (keepVersions - 1))
    val referenced = (keepFrom to latest)
      .filter(v => f.exists(manifestPath(dir, v)))
      .flatMap(v => manifestFiles(spark, dir, v)).toSet
    val dataRoot = new Path(dir, "data")
    if (!f.exists(dataRoot)) return 0
    val cutoff = System.currentTimeMillis() - minAgeMs
    var deleted = 0
    f.listStatus(dataRoot).foreach { sub =>
      if (sub.isDirectory) {
        f.listStatus(sub.getPath).foreach { df =>
          val rel = s"data/${sub.getPath.getName}/${df.getPath.getName}"
          if (df.isFile && !referenced.contains(rel)
              && df.getModificationTime <= cutoff) {
            if (f.delete(df.getPath, false)) deleted += 1
          }
        }
        if (f.listStatus(sub.getPath).isEmpty) f.delete(sub.getPath, false)
      }
    }
    // Old manifests: anything before the keep window.
    (0L until keepFrom).foreach { v =>
      val p = manifestPath(dir, v)
      if (f.exists(p)) f.delete(p, false)
    }
    deleted
  }
}
