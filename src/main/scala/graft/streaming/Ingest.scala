package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.catalog.{Catalog, FolderMeta}
import graft.extract.Extractor
import graft.functions.Clean

/** The streaming rebuild of the reference's ingest engine (`POST /`,
  * reference main.py:656-759): file lands → admission filter → path
  * route → extraction → typed casts → schema-evolving append →
  * archive.
  *
  * The reference processes one file per HTTP request with no retry and
  * a duplicate window between insert and archive (main.py:744-752).
  * Here the same dataflow is a Structured Streaming query:
  *
  *  - the GCS object-finalize push becomes the file source's pull
  *    (micro-batch listing, checkpointed);
  *  - exactly-once comes from checkpoint + idempotent per-batch
  *    writes: each micro-batch lands in a `_batch_id=<id>` partition
  *    written with dynamic partition overwrite, so a retried batch
  *    overwrites itself instead of duplicating (an improvement over
  *    the reference, documented in SURVEY.md §7.4);
  *  - the archive move (O17) is bookkeeping only — dedup no longer
  *    depends on it.
  *
  * Ingest is embarrassingly parallel per file: no shuffle anywhere in
  * the plan, so at 100 TB this scales linearly with executors; the
  * only driver-side state is the O(#folders) catalog.
  */
object Ingest {

  /** Admission filter + path route (O2+O3, main.py:660-672), on the
    * absolute source path. Positions are taken from the end so the
    * landing dir's own depth doesn't matter:
    * .../incoming/{uid}/{folder}/batch/{file}. */
  def admit(df: DataFrame): DataFrame = {
    val parts = split(col("path"), "/")
    df.filter(!col("path").contains("processed/")
        && lower(col("path")).endsWith(".pdf")
        && !col("path").endsWith(".placeholder")
        && size(parts) >= 5
        && element_at(parts, -5) === "incoming"
        && element_at(parts, -2) === "batch")
      .withColumn("uid", element_at(parts, -4))
      .withColumn("folder", element_at(parts, -3))
      .withColumn("file_name", element_at(parts, -1))
  }

  /** Typed value cast for one KPI (O11/O12/O13 dispatch, the
    * reference's convert_value_for_bq, main.py:219-250). */
  /** Content normalization before extraction — the reference flow is
    * PDF → model (main.py:694-713 ships the PDF bytes); ours is
    * PDF → TEXT → extractor, with the real
    * [[graft.operators.PdfCodec]] doing the text layer: payloads that
    * are PDFs in the codec's profile extract to their shown text
    * (UTF-8 bytes); out-of-profile PDFs and every non-PDF payload
    * pass through untouched, so the deterministic/RPC extractors see
    * exactly what they did before for all existing fixtures. */
  private[streaming] def pdfTextNormalized(content: Array[Byte]): Array[Byte] =
    if (content.length >= 5 && content(0) == '%' && content(1) == 'P' &&
        content(2) == 'D' && content(3) == 'F' && content(4) == '-')
      graft.operators.PdfCodec.extractText(content)
        .map(_.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .getOrElse(content)
    else content

  private def castKpi(raw: org.apache.spark.sql.Column, logicalType: String) =
    logicalType match {
      case "number" => Clean.parseMessyNumber(raw)
      case "date"   => Clean.parseFuzzyDate(raw)
      case _        => Clean.nullNormalize(raw)
    }

  /** Project one folder's admitted+extracted rows to its typed schema
    * (O15 row construction, main.py:726-741 — row_id is content-derived
    * sha2(path) instead of the reference's wall-clock epoch for
    * determinism). */
  private def project(extracted: DataFrame, meta: FolderMeta): DataFrame = {
    val kpiCols = meta.kpis.map(k =>
      castKpi(element_at(col("kpis"), k.name), k.logicalType).as(k.columnName))
    extracted.select(
      (sha2(col("path"), 256).as("row_id")
        +: col("file_name").as("file_name")
        +: current_timestamp().as("uploaded_at")
        +: kpiCols): _*)
  }

  /** Start the ingest stream over `landingDir`. Files are appended to
    * `warehouseDir/<table>` and then moved under `processedDir`
    * keeping their incoming/... suffix. */
  def start(spark: SparkSession,
            landingDir: String,
            warehouseDir: String,
            processedDir: String,
            checkpointDir: String,
            catalog: Catalog,
            extractor: Extractor,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None,
            maxConcurrentFolderWrites: Int = 4): StreamingQuery = {

    // Extraction goes through the extractor's BATCH hook: each
    // partition's rows are grouped into extractor.batchSize chunks and
    // handed down in one call — per-doc extractors loop internally,
    // RPC-backed ones ([[graft.extract.BatchedRpcExtractor]]) make one
    // remote call per chunk with retry/backoff. A failing extraction
    // must not kill the micro-batch (the reference logs-and-continues,
    // main.py:757-759): failures degrade to the all-"N/A" map, which
    // the sentinel normalization turns into a row of NULL KPIs — the
    // file is still recorded and archived.
    def withKpis(subset: DataFrame, keys: Seq[String]): DataFrame = {
      val schema = subset.schema.add("kpis",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
      val nameIdx = subset.schema.fieldIndex("file_name")
      val contentIdx = subset.schema.fieldIndex("content")
      val chunk = extractor.batchSize
      subset.mapPartitions { it =>
        it.grouped(chunk).flatMap { rows =>
          val docs = rows.map(r =>
            (r.getString(nameIdx),
              pdfTextNormalized(r.getAs[Array[Byte]](contentIdx))))
          val maps = extractor.extractAll(docs, keys)
          // Defend the row count against a misbehaving extractAll
          // override: a short result must degrade the TAIL rows to
          // "N/A" maps, never drop them — dropped rows would still be
          // archived below, which is unrecoverable loss.
          rows.zipWithIndex.map { case (r, i) =>
            val m = if (i < maps.size) maps(i) else keys.map(_ -> "N/A").toMap
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ m)
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    }

    // The binaryFile source's schema is fixed but streaming sources
    // don't infer — declare it.
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    // maxFilesPerTrigger bounds a micro-batch when a backlog of
    // millions of files lands at once (restart after downtime) — each
    // batch stays memory-bounded instead of listing the world.
    val reader = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("recursiveFileLookup", "true")
    val source = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .load(landingDir)

    admit(source).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Crash-replay tolerance: archive() moves landing files before
        // the checkpoint commits this batch, so a replayed batch can
        // list files that no longer exist in landing. Two guards make
        // replay idempotent (write-before-archive ordering guarantees a
        // file is only ever missing if its row was durably written):
        //  1. ignoreMissingFiles while this batch runs. NOTE: the flag
        //     is SESSION-GLOBAL, not batch-scoped — every query sharing
        //     this SparkSession silently skips missing files until the
        //     batch ends (run ingest on a dedicated/cloned session if
        //     that matters). Set/restore is reference-counted so
        //     concurrent ingest streams on one session cannot clobber
        //     each other's restore mid-batch;
        //  2. the per-folder write MERGES the previously written
        //     _batch_id partition (left-anti on row_id) into the
        //     dynamic overwrite, so rows whose source file the crashed
        //     attempt already archived survive the rewrite.
        acquireIgnoreMissingFiles(spark)
        // Persist: every per-folder write re-evaluates the batch, and
        // the archive move below deletes source files — an unpersisted
        // batch would re-read moved files when one micro-batch spans
        // several folders.
        batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val present = batch.select("uid", "folder").distinct()
            .collect().map(r => (r.getString(0), r.getString(1)))
          def ingestFolder(u: String, f: String): Boolean =
            catalog.get(u, f).exists { meta =>
              val keys = meta.kpis.map(_.name)
              val subset = withKpis(
                batch.filter(col("uid") === u && col("folder") === f), keys)
              val fresh = project(subset, meta)
                .withColumn("_batch_id", lit(batchId))
              val tablePath = s"$warehouseDir/${meta.tableName}"
              // Rows written by a crashed attempt for files that are no
              // longer in landing: carry them through the overwrite.
              // Reading only the _batch_id=<id> subdir keeps this a
              // partition-pruned read — O(batch), not O(table).
              // localCheckpoint(eager) CUTS LINEAGE, not just caches:
              // the dynamic overwrite below deletes the very parquet
              // files this plan reads, so a cache-loss recompute after
              // the commit (persist+count's failure mode) would
              // silently resolve to zero rows under ignoreMissingFiles.
              // Checkpointed blocks have no parent to recompute from.
              val carried = try {
                Some(spark.read.option("basePath", tablePath)
                  .parquet(s"$tablePath/_batch_id=$batchId")
                  .withColumn("_batch_id", lit(batchId))
                  .join(fresh.select("row_id"), Seq("row_id"), "left_anti")
                  .localCheckpoint(eager = true))
              } catch { case _: org.apache.spark.sql.AnalysisException => None }
              val merged = carried.fold(fresh)(c =>
                fresh.unionByName(c, allowMissingColumns = true))
              merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(tablePath)
              carried.foreach(_.unpersist())
              true
            }
          // Per-folder writes are independent Spark jobs; running them
          // from one driver thread serializes #folders job latencies
          // (each job is small — the cluster idles between them). A
          // bounded pool overlaps them; a failure in any folder fails
          // the batch (Future.get rethrows) so the checkpoint doesn't
          // commit a partial batch — replay semantics unchanged.
          // Parallelism is per TABLE PATH, not per (uid, folder):
          // identifier sanitization can collide two distinct folders
          // onto one table (a.b and a_b both → a_b — the reference
          // shares one BigQuery table the same way), and those two
          // writes must not race on the same directory — they run
          // sequentially inside their group.
          val byTable: Seq[Seq[(String, String)]] = present.toSeq
            .groupBy { uf: (String, String) =>
              catalog.get(uf._1, uf._2).map(_.tableName)
                .getOrElse(uf._1 + " " + uf._2) }
            .values.toSeq
          def ingestGroup(group: Seq[(String, String)]): Seq[(String, String)] =
            group.filter { case (u, f) => ingestFolder(u, f) }
          val ingested: Seq[(String, String)] =
            if (byTable.length <= 1) byTable.flatMap(ingestGroup)
            else {
              val pool = java.util.concurrent.Executors.newFixedThreadPool(
                math.min(maxConcurrentFolderWrites, byTable.length))
              try {
                // Each task returns Try so get() never throws early:
                // ALL groups must finish (success or failure) before a
                // failure propagates — rethrowing while other groups'
                // writes are mid-flight would let zombie writes race
                // the failed batch's replay on the same table paths.
                val outcomes = byTable.map { group =>
                  pool.submit(new java.util.concurrent.Callable[scala.util.Try[Seq[(String, String)]]] {
                    override def call(): scala.util.Try[Seq[(String, String)]] =
                      scala.util.Try(ingestGroup(group))
                  })
                }.map(_.get())
                outcomes.collectFirst { case scala.util.Failure(e) => e }
                  .foreach(e => throw e)
                outcomes.flatMap(_.get)
              } finally { pool.shutdown() }
            }
          // Archive ONLY after every folder's rows are durably written
          // (O17's crash window closed by ordering + checkpoint).
          ingested.foreach { case (u, f) =>
            archive(spark, batch, u, f, processedDir)
          }
        } finally {
          batch.unpersist()
          releaseIgnoreMissingFiles(spark)
        }
      }
      .start()
  }

  /** Reference-counted set/restore of the SESSION-GLOBAL
    * spark.sql.files.ignoreMissingFiles flag: the first in-flight
    * ingest batch on a session saves the prior value and forces true;
    * the last one out restores it. Without the counter, two ingest
    * streams sharing a session could restore the flag while the
    * other's replay is mid-flight and fail it. */
  private val imfKey = "spark.sql.files.ignoreMissingFiles"
  private val imfDepth = new java.util.concurrent.ConcurrentHashMap[SparkSession, (Int, Option[String])]()
  private def acquireIgnoreMissingFiles(spark: SparkSession): Unit =
    imfDepth.synchronized {
      imfDepth.compute(spark, (_, cur) => cur match {
        case null | (0, _) =>
          val prev = spark.conf.getOption(imfKey)
          spark.conf.set(imfKey, "true")
          (1, prev)
        case (n, prev) => (n + 1, prev)
      })
      ()
    }
  private def releaseIgnoreMissingFiles(spark: SparkSession): Unit =
    imfDepth.synchronized {
      imfDepth.compute(spark, (_, cur) => cur match {
        case null => null
        case (1, prev) =>
          prev.fold(spark.conf.unset(imfKey))(v => spark.conf.set(imfKey, v))
          null
        case (n, prev) => (n - 1, prev)
      })
      ()
    }

  /** O17 archive move (main.py:750-752): relocate ingested files under
    * processedDir, preserving the incoming/... suffix. Bookkeeping
    * only — exactly-once is the checkpoint's job.
    *
    * The renames run DISTRIBUTED (foreachPartition over the batch's
    * path column): the driver never collects the file list, so a
    * landing zone with millions of small files archives at executor
    * parallelism instead of serializing one rename at a time on the
    * driver. Renames are independent per file, so task retries and
    * speculative duplicates are safe — the exists() guard makes the
    * move idempotent. */
  private def archive(spark: SparkSession, batch: DataFrame,
                      uid: String, folder: String, processedDir: String): Unit = {
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    batch.filter(col("uid") === uid && col("folder") === folder)
      .select("path")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = bcConf.value.value
        rows.foreach { r =>
          val p = r.getString(0)
          val src = new Path(p)
          val fs = src.getFileSystem(conf)
          val suffix = p.substring(p.lastIndexOf("incoming/"))
          val dst = new Path(s"$processedDir/$suffix")
          // A replayed batch may list files a crashed attempt already
          // moved — skip them instead of failing the move.
          if (fs.exists(src)) {
            fs.mkdirs(dst.getParent)
            fs.rename(src, dst)
          }
        }
      }
  }

  /** Read back a folder's table with evolved schema, dropping
    * bookkeeping columns (the `_batch_id` idempotence partition). */
  def readTable(spark: SparkSession, warehouseDir: String,
                meta: FolderMeta): DataFrame =
    Catalog.readTable(spark, warehouseDir, meta).drop("_batch_id")
}
