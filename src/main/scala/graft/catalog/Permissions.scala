package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's access-control predicates (O19-O22,
  * main.py:531-548, 778-802), vectorized as DataFrame operations.
  *
  * Reference shapes → distributed forms:
  *  - O19 point lookup `tenants/{uid}/folders/{fid}` → an equality
  *    filter on the folders catalog;
  *  - O21 nested-loop scan over ALL tenants probing for folder_id
  *    (main.py:784-791, O(tenants) RPCs with early exit) → inverted
  *    into one filtered scan: `folders.filter(folder_id === fid)`;
  *  - O20/O22 permission predicate
  *    `uid == owner ∨ uid ∈ shared_with ∨ ∃ share-doc` → a boolean
  *    filter plus a LEFT SEMI join against the shares table — the
  *    existence probe done for all folders in one pass instead of one
  *    RPC per folder.
  *
  * Expected schemas (mirroring the Firestore docs):
  *   folders: owner_uid, folder_id, shared_with array<string>, ...
  *   shares:  owner_id, folder_id, email   (flat collection keyed
  *            {owner}_{folder}_{email}, main.py:618-626)
  *
  * Scale: folders/shares are metadata tables (bounded by tenants, not
  * data volume) — broadcast-joinable at any data SF.
  */
object Permissions {

  /** O19/O21: resolve a folder id to its (first) owning doc. */
  def resolveFolder(folders: DataFrame, folderId: String): DataFrame =
    folders.filter(col("folder_id") === folderId).limit(1)

  /** O22's three-way predicate for ONE principal, vectorized over all
    * folders: the folders `uid`/`email` may access. Union of
    * ownership, shared_with membership, and share-doc existence
    * (LEFT SEMI against shares). */
  def accessibleFolders(folders: DataFrame, shares: DataFrame,
                        uid: String, email: String): DataFrame = {
    val owned = folders.filter(col("owner_uid") === uid)
    val sharedArray = folders.filter(array_contains(col("shared_with"), email))
    val sharedDoc = folders.join(
      shares.filter(col("email") === email)
        .select(col("owner_id").as("s_owner"), col("folder_id").as("s_fid")),
      col("owner_uid") === col("s_owner") && col("folder_id") === col("s_fid"),
      "left_semi")
    owned.unionByName(sharedArray).unionByName(sharedDoc)
      .dropDuplicates("owner_uid", "folder_id")
  }

  /** O20/O22 as a point check (the reference's per-request gate):
    * true iff `uid`/`email` may read `folderId`. */
  def canAccess(folders: DataFrame, shares: DataFrame,
                uid: String, email: String, folderId: String): Boolean =
    !accessibleFolders(folders, shares, uid, email)
      .filter(col("folder_id") === folderId)
      .isEmpty

  /** O23 (main.py:459): reshape an extracted map column to the
    * reference's [{key, value}] list-of-structs form. */
  def mapToKeyValueList(spark: SparkSession, df: DataFrame,
                        mapCol: String): DataFrame =
    df.withColumn("kv", expr(
      s"transform(map_entries($mapCol), e -> named_struct('key', e.key, 'value', e.value))"))
}
