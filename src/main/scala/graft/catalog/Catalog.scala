package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.functions.Inference

/** KPI metadata for one confirmed field (reference main.py:486-494:
  * name, sanitized column name, inferred logical type). */
final case class KpiMeta(name: String, logicalType: String) {
  /** O14 column rule (main.py:281): `kpi_` + sanitized + lowered. */
  def columnName: String =
    "kpi_" + name.replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
  def dataType: DataType = Inference.physicalType(logicalType)
}

/** Folder-level metadata (reference Firestore doc
  * tenants/{uid}/folders/{fid}, main.py:393-403): the trained KPI set
  * plus the extraction context hint. */
final case class FolderMeta(uid: String, folder: String,
                            contextHint: String, kpis: Seq[KpiMeta]) {
  /** The reference's per-(tenant,folder) table name (main.py:262-264). */
  def tableName: String = {
    def clean(s: String) = s.replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
    s"${clean(uid)}_${clean(folder)}"
  }

  /** Target schema: 3 system columns + typed KPI columns
    * (main.py:294-314). */
  def schema: StructType = StructType(
    Seq(
      StructField("row_id", StringType, nullable = false),
      StructField("file_name", StringType),
      StructField("uploaded_at", TimestampType)) ++
      kpis.map(k => StructField(k.columnName, k.dataType)))
}

/** In-engine catalog replacing the reference's Firestore tree: an
  * immutable map of (uid, folder) → FolderMeta, typically built once
  * on the driver from training output ([[Catalog.train]]) and
  * broadcast by closure into the ingest job. O(#folders) driver-side
  * state — at 100 TB the data scales, the catalog does not.
  */
final case class Catalog(folders: Map[(String, String), FolderMeta]) {
  def get(uid: String, folder: String): Option[FolderMeta] =
    folders.get((uid, folder))
  def add(meta: FolderMeta): Catalog =
    Catalog(folders + ((meta.uid, meta.folder) -> meta))
}

object Catalog {
  val empty: Catalog = Catalog(Map.empty)

  private final case class KpiRow(name: String, logicalType: String)
  private final case class FolderRow(uid: String, folder: String,
                                     contextHint: String, kpis: Seq[KpiRow])

  /** Persist the catalog as JSON under the warehouse (the rebuild's
    * Firestore analog — reference main.py:497-503 persists folder
    * metadata on confirm). O(#folders) rows; coalesced to one file so
    * the catalog read is a single-object fetch. Also refreshes the
    * [[loadCached]] fast path for this warehouse. */
  def save(spark: SparkSession, catalog: Catalog, warehouseDir: String): Unit = {
    import spark.implicits._
    catalog.folders.values.toSeq
      .map(m => FolderRow(m.uid, m.folder, m.contextHint,
        m.kpis.map(k => KpiRow(k.name, k.logicalType))))
      .toDS().coalesce(1)
      .write.mode("overwrite").json(s"$warehouseDir/_catalog")
    loadCache.put(warehouseDir, (catalog, fingerprint(spark, warehouseDir)))
    ()
  }

  /** Read-back fast path (the reference's precomputed-metadata branch,
    * main.py:551-560: a folder doc whose kpi metadata is already
    * materialized is served without recomputation — vs the recompute
    * path at main.py:563-580). First [[load]] per warehouse dir scans
    * the JSON; subsequent reads in the same JVM are served from memory.
    * [[save]] refreshes the entry, so a save-then-read cycle never
    * serves stale metadata; an external writer updating the warehouse
    * behind this JVM's back requires [[invalidate]]. Catalogs are
    * O(#folders) driver-side values — the cache is bounded by the
    * number of distinct warehouses a process touches. */
  def loadCached(spark: SparkSession, warehouseDir: String): Catalog =
    loadCache.computeIfAbsent(warehouseDir, _ => {
      // Fingerprint BEFORE load: if an external writer lands between
      // the two, we pair the OLD fp with (possibly) new data and the
      // next loadCachedFresh pays one redundant reload — the reverse
      // order would pair the NEW fp with old data and serve stale
      // forever.
      val fp = fingerprint(spark, warehouseDir)
      (load(spark, warehouseDir), fp)
    })._1

  /** [[loadCached]] with a STALENESS CHECK: one filesystem listing of
    * `_catalog` (names + lengths + mtimes) decides whether the cached
    * catalog still matches the store — an external writer's update is
    * picked up without the full JSON read/collect, while an unchanged
    * store costs one list RPC instead of a re-scan. Use this on read
    * paths that may race other writers; [[loadCached]] stays the
    * zero-RPC path for single-writer processes. */
  def loadCachedFresh(spark: SparkSession, warehouseDir: String): Catalog = {
    val fp = fingerprint(spark, warehouseDir)
    val cached = loadCache.get(warehouseDir)
    if (cached != null && cached._2 == fp) cached._1
    else {
      val fresh = (load(spark, warehouseDir), fp)
      loadCache.put(warehouseDir, fresh)
      fresh._1
    }
  }

  /** Drop [[loadCached]]'s entry for one warehouse (external update). */
  def invalidate(warehouseDir: String): Unit = {
    loadCache.remove(warehouseDir)
    ()
  }

  /** Cheap content fingerprint of the persisted catalog: the sorted
    * (name, length, mtime) listing of `_catalog`. ONE FS list call —
    * no data read, no exists() pre-check (an overwrite-in-flight
    * deletes the dir between exists and list; catching the miss is
    * both atomic and one RPC cheaper). NB [[save]] fingerprints after
    * its own write — a DIFFERENT external writer landing inside that
    * window is first seen at that writer's next update; racing
    * catalog writers need external coordination regardless. */
  private def fingerprint(spark: SparkSession, warehouseDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$warehouseDir/_catalog")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.listStatus(p).map(s =>
      s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")
    catch { case _: java.io.FileNotFoundException => "absent" }
  }

  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Catalog, String)]()

  /** Load a previously [[save]]d catalog. */
  def load(spark: SparkSession, warehouseDir: String): Catalog = {
    import spark.implicits._
    val rows = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[FolderRow]].schema)
      .json(s"$warehouseDir/_catalog")
      .as[FolderRow].collect()
    Catalog(rows.map(r => (r.uid, r.folder) ->
      FolderMeta(r.uid, r.folder, r.contextHint,
        r.kpis.map(k => KpiMeta(k.name, k.logicalType)))).toMap)
  }

  /** Training flow (reference §3.2: /analyze-master + /confirm-kpis):
    * run schema discovery over one master document's extracted map,
    * classify ALL fields in ONE batched [[Inference.inferTypes]] hook
    * call (main.py:90-162's single LLM request, with its closed-set
    * validation and per-column regex fallback), and register the
    * folder. Driver-side O(#fields). */
  def train(uid: String, folder: String, contextHint: String,
            discovered: Map[String, String],
            hook: Inference.TypeInferenceHook = Inference.RegexTypeInference): FolderMeta = {
    val types = Inference.inferTypes(discovered, hook)
    mustNotCollide(discovered.keys.toSeq)
    FolderMeta(uid, folder, contextHint,
      discovered.toSeq.sortBy(_._1).map { case (name, _) =>
        KpiMeta(name, types(name))
      })
  }

  /** Distinct KPI names sanitizing to one column would give the folder
    * a duplicate-field schema (the reference's BigQuery DDL would
    * reject the same collision) — fail at training time, with names. */
  private def mustNotCollide(names: Seq[String]): Unit = {
    val dup = names.groupBy(KpiMeta(_, "string").columnName)
      .collect { case (c, ns) if ns.size > 1 => s"$c <- ${ns.mkString("/")}" }
    require(dup.isEmpty,
      s"KPI column collision after sanitization: ${dup.mkString("; ")}")
  }

  /** Legacy untyped registration (reference main.py:319-351,
    * `sync_bigquery_schema`): when only a KPI NAME list exists — no
    * samples, no inferred metadata — every KPI column is plain STRING.
    * Used by the pre-typed-metadata ingest path (main.py:722-724's
    * fallback branch); rows land with sentinel normalization only, no
    * numeric/date casts. The typed path ([[train]]) is strictly
    * better when samples exist. */
  def trainLegacy(uid: String, folder: String, contextHint: String,
                  kpiNames: Seq[String]): FolderMeta = {
    mustNotCollide(kpiNames)
    FolderMeta(uid, folder, contextHint,
      kpiNames.sorted.map(KpiMeta(_, "string")))
  }

  /** Schema-evolving read of an appended table (O16 read side): every
    * parquet footer in the directory is merged, so rows written before
    * a column existed surface it as NULL (main.py:273-291 ADD COLUMN
    * semantics, without the 2s DDL stall). */
  def readTable(spark: SparkSession, warehouseDir: String,
                meta: FolderMeta): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"$warehouseDir/${meta.tableName}")
}
