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
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {

    // A failing extractor must not kill the micro-batch (the reference
    // logs-and-continues, main.py:757-759): a throw degrades to the
    // all-"N/A" map, which the sentinel normalization turns into a row
    // of NULL KPIs — the file is still recorded and archived.
    val extractUdf = udf((name: String, content: Array[Byte], keys: Seq[String]) =>
      try extractor.extract(name, content, keys)
      catch { case _: Exception => keys.map(_ -> "N/A").toMap })

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
        //  1. ignoreMissingFiles, scoped to this batch: already-
        //     archived files drop out of the re-read instead of
        //     permanently failing the micro-batch;
        //  2. the per-folder write MERGES the previously written
        //     _batch_id partition (left-anti on row_id) into the
        //     dynamic overwrite, so rows whose source file the crashed
        //     attempt already archived survive the rewrite.
        val imf = "spark.sql.files.ignoreMissingFiles"
        val imfPrev = spark.conf.getOption(imf)
        spark.conf.set(imf, "true")
        // Persist: every per-folder write re-evaluates the batch, and
        // the archive move below deletes source files — an unpersisted
        // batch would re-read moved files when one micro-batch spans
        // several folders.
        batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val present = batch.select("uid", "folder").distinct()
            .collect().map(r => (r.getString(0), r.getString(1)))
          val ingested = present.filter { case (u, f) =>
            catalog.get(u, f).exists { meta =>
              val keys = meta.kpis.map(_.name)
              val subset = batch
                .filter(col("uid") === u && col("folder") === f)
                .withColumn("kpis",
                  extractUdf(col("file_name"), col("content"),
                    typedLit(keys)))
              val fresh = project(subset, meta)
                .withColumn("_batch_id", lit(batchId))
              val tablePath = s"$warehouseDir/${meta.tableName}"
              // Rows written by a crashed attempt for files that are no
              // longer in landing: carry them through the overwrite.
              // Reading only the _batch_id=<id> subdir keeps this a
              // partition-pruned read — O(batch), not O(table).
              val carried = try {
                val prev = spark.read.option("basePath", tablePath)
                  .parquet(s"$tablePath/_batch_id=$batchId")
                  .withColumn("_batch_id", lit(batchId))
                  .join(fresh.select("row_id"), Seq("row_id"), "left_anti")
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                prev.count() // materialize BEFORE overwriting its source files
                Some(prev)
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
          }
          // Archive ONLY after every folder's rows are durably written
          // (O17's crash window closed by ordering + checkpoint).
          ingested.foreach { case (u, f) =>
            archive(spark, batch, u, f, processedDir)
          }
        } finally {
          batch.unpersist()
          imfPrev.fold(spark.conf.unset(imf))(v => spark.conf.set(imf, v))
          ()
        }
      }
      .start()
  }

  /** O17 archive move (main.py:750-752): relocate ingested files under
    * processedDir, preserving the incoming/... suffix. Bookkeeping
    * only — exactly-once is the checkpoint's job. */
  private def archive(spark: SparkSession, batch: DataFrame,
                      uid: String, folder: String, processedDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    batch.filter(col("uid") === uid && col("folder") === folder)
      .select("path").collect().map(_.getString(0)).foreach { p =>
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

  /** Read back a folder's table with evolved schema, dropping
    * bookkeeping columns (the `_batch_id` idempotence partition). */
  def readTable(spark: SparkSession, warehouseDir: String,
                meta: FolderMeta): DataFrame =
    Catalog.readTable(spark, warehouseDir, meta).drop("_batch_id")
}
