package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** O24: the assembled upload-validation operator (reference
  * main.py:596-651, `POST /upload-batch-file`) — the pre-ingest gate
  * that decides whether a candidate file may land in the watched
  * layout at all. The reference validates one multipart request per
  * HTTP call; here a whole batch of upload requests is validated in
  * one pass and accepted files are written straight into the landing
  * layout [[Ingest]] consumes.
  *
  * Gate order mirrors the reference exactly:
  *  1. required fields present (main.py:611-612) → `missing_fields`;
  *  2. `.pdf` suffix, case-insensitive (main.py:614) → `not_pdf`;
  *  3. a share doc must exist for (owner, folder, uploader email)
  *     (main.py:620-623, the flat shares collection) → `no_share`;
  *  4. its permission must be "edit" (main.py:626-629) → `view_only`;
  *  5. filename sanitized `[^a-zA-Z0-9_.-]` → `_`, null → unnamed.pdf
  *     (main.py:631-632);
  *  6. landing path `incoming/{owner}/{folder}/batch/{name}`
  *     (main.py:634). Unlike the reference — whose GCS blob namespace
  *     is flat and cannot traverse — this path lands on a Hadoop
  *     filesystem, so ids that would change the directory structure
  *     ('/' or '\' anywhere, or a segment equal to '.' or '..') are
  *     REJECTED (`bad_path`) rather than rewritten: rewriting would
  *     silently desynchronize the landing path from the raw-keyed
  *     catalog ([[graft.catalog.Catalog]] keys on the ORIGINAL ids,
  *     and [[Ingest]] parses them back out of the path), losing the
  *     upload at ingest time — or worse, colliding two tenants into
  *     one directory. Benign ids (dots, '@', unicode) pass through
  *     raw and round-trip exactly; a single path segment containing
  *     a dot (e.g. `team.a`) cannot traverse.
  *
  * The permission probe is a broadcast LEFT join against the shares
  * table (metadata-sized — bounded by tenants, not data volume), so
  * validating a million queued uploads is one map-side pass, zero
  * shuffles of the binary payloads.
  */
object UploadAdmission {

  /** Expected `requests` columns: email, owner_id, folder_id,
    * file_name, content (binary). `shares` columns as in
    * [[graft.catalog.Permissions]]: owner_id, folder_id, email,
    * permission. Output adds: `sanitized_name`, `storage_path`,
    * `accepted`, `reject_reason` (NULL when accepted). */
  def validate(requests: DataFrame, shares: DataFrame): DataFrame = {
    val s = broadcast(shares.select(
      col("owner_id").as("_s_owner"), col("folder_id").as("_s_folder"),
      col("email").as("_s_email"), col("permission").as("_s_perm")))
    val joined = requests.join(s,
      col("owner_id") === col("_s_owner")
        && col("folder_id") === col("_s_folder")
        && col("email") === col("_s_email"),
      "left")
    // Empty string counts as missing, like the reference's Python
    // falsiness check (main.py:611 `if not folder_id`): an accepted
    // empty owner_id would also collapse a path level in storage_path
    // ('incoming//f1/...' normalizes to 'incoming/f1/...'), promoting
    // the folder into the owner directory — the collision the
    // traversal gate exists to prevent.
    val missing = col("folder_id").isNull || col("folder_id") === "" ||
      col("owner_id").isNull || col("owner_id") === "" ||
      col("content").isNull
    // Traversal gate: an id that would add/remove a path level can
    // never be written (see scaladoc — reject, don't rewrite, so
    // accepted paths stay byte-identical to the catalog's raw keys).
    def traverses(c: org.apache.spark.sql.Column) =
      c.contains("/") || c.contains("\\") || c === "." || c === ".."
    // A null/empty email is the reference's 401 path (main.py:604-609),
    // checked BEFORE the field/suffix/share gates — without it the
    // share probe would misreport "no_share" for a malformed request.
    val reason = when(col("email").isNull || col("email") === "",
        lit("unauthorized"))
      .when(missing, lit("missing_fields"))
      .when(traverses(col("owner_id")) || traverses(col("folder_id")),
        lit("bad_path"))
      .when(!lower(coalesce(col("file_name"), lit(""))).endsWith(".pdf"),
        lit("not_pdf"))
      .when(col("_s_perm").isNull, lit("no_share"))
      .when(col("_s_perm") =!= "edit", lit("view_only"))
    // file_name keeps the reference's sanitizer — it maps '/' and '\'
    // to '_' itself, and a FILE segment containing dots cannot
    // traverse, so the name needs no reject gate.
    val sanitized = regexp_replace(
      coalesce(col("file_name"), lit("unnamed.pdf")),
      "[^a-zA-Z0-9_.-]", "_")
    joined
      .withColumn("reject_reason", reason)
      .withColumn("accepted", col("reject_reason").isNull)
      .withColumn("sanitized_name", sanitized)
      .withColumn("storage_path",
        concat(lit("incoming/"), col("owner_id"), lit("/"),
          col("folder_id"), lit("/batch/"), col("sanitized_name")))
      .drop("_s_owner", "_s_folder", "_s_email", "_s_perm")
  }

  /** Validate and land: accepted payloads are written under
    * `landingDir/<storage_path>` from the EXECUTORS (foreachPartition
    * + Hadoop FS — content bytes never transit the driver), ready for
    * [[Ingest.start]] to pick up. Returns the annotated validation
    * frame (accepted + rejected rows with reasons) for
    * auditing/retry — the reference's per-request 200/400/403 split,
    * as data.
    *
    * Two accepted requests sanitizing to the SAME storage_path write
    * last-one-wins — the reference's blob overwrite behavior
    * (main.py:634-640); dedupe upstream if that matters.
    *
    * The audit frame is checkpointed (both the write and the caller
    * consume it) and registered with `registry` — release it once the
    * audit is consumed, as with the Dedup intermediates. */
  def admit(requests: DataFrame, shares: DataFrame,
            landingDir: String,
            registry: graft.operators.CacheRegistry =
              graft.operators.CacheRegistry.global): DataFrame = {
    val validated = registry.track(validate(requests, shares)
      // Both the write and the returned audit frame consume this plan;
      // cut lineage so the broadcast-join runs once.
      .localCheckpoint(true))
    // Hadoop Configuration isn't serializable — ship its entries as a
    // plain map and rebuild per partition (keeps object-store creds
    // and custom FS settings working on executors).
    val confEntries = {
      val hc = requests.sparkSession.sparkContext.hadoopConfiguration
      val it = hc.iterator()
      val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    validated.filter(col("accepted"))
      .select("storage_path", "content")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val hc = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => hc.set(k, v) }
        it.foreach { r =>
          val dst = new Path(s"$landingDir/${r.getString(0)}")
          val fs = dst.getFileSystem(hc)
          fs.mkdirs(dst.getParent)
          val out = fs.create(dst, true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
      }
    validated
  }
}
