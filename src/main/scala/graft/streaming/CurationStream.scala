package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.TextAnalysis
import graft.operators.CacheRegistry
import graft.sources.SnapshotTable

/** The trillion-token CURATION PIPELINE as a stream: incoming
  * documents pass the batch engine's own gates — Gopher structural
  * rejects, the exact-integer quality threshold (the q_corpus_funnel
  * stages), then the incremental near-dup decision against a
  * materialized base-corpus MinHash index ([[DedupOnIngest]]) — and
  * survivors land EXACTLY ONCE in a [[SnapshotTable]] via its
  * transaction ledger (batchId = txn version, replays are manifest
  * no-ops). This is the composition the engine exists for: every
  * stage is the same operator the batch path ships, so batch
  * calibration (thresholds, funnel attrition) transfers verbatim to
  * the stream.
  *
  * Determinism / invariance: every per-document decision depends only
  * on (document, static index) — no cross-document state — so stamps
  * are BATCH-SPLIT INVARIANT (any partitioning of the same docs into
  * micro-batches produces the same kept set; pinned in
  * EventStreamsSpec), and the documented incremental-dedup contract
  * applies (two in-flight near-dups of each other but not of the base
  * both pass; the epoch-boundary re-index catches them).
  *
  * Scale: the gates are map-only expressions; the dedup probe
  * shuffles 8-byte signature keys against a bucketed index
  * (exchange-free on the index side); the only table-sized state is
  * the index, built offline. Per-batch work is proportional to the
  * batch, never the corpus. */
object CurationStream {

  /** One micro-batch through the full gate chain. Returns the batch
    * rows stamped with per-stage verdicts (audit-friendly): `g`
    * (structural), `q` (quality), `is_dup`, and `keep`. */
  def stampBatch(spark: SparkSession, batch: DataFrame, indexTable: String,
                 qualityFloor: Long = 6000L,
                 registry: CacheRegistry = CacheRegistry.global): DataFrame = {
    val gated = batch
      .withColumn("g", TextAnalysis.gopherReject(col("text")).isNull)
      .withColumn("q",
        floor(TextAnalysis.qualityScore(col("text")) * 10000.0 + 0.5)
          .cast("long") >= qualityFloor)
    // Dedup only what survived the cheap gates: the probe is the
    // expensive stage, so structural/quality rejects never sign.
    val survivors = gated.filter(col("g") && col("q"))
      .select("doc_id", "text")
    val stamped = DedupOnIngest.stampBatch(spark, survivors, indexTable,
      registry = registry)
      .select(col("doc_id"), col("is_dup"))
    gated.join(stamped, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("g"), col("q"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
      .withColumn("keep", col("g") && col("q") && !col("is_dup"))
  }

  /** Start the stream: gate each micro-batch, append the KEPT rows
    * (doc_id, text) exactly-once into the snapshot table at
    * `tableDir` under `appId`'s transaction ledger. */
  def start(spark: SparkSession, docs: DataFrame, indexTable: String,
            tableDir: String, checkpointPath: String, appId: String,
            qualityFloor: Long = 6000L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val kept = stampBatch(spark, batch, indexTable, qualityFloor)
          .filter(col("keep"))
          .select("doc_id", "text")
        SnapshotTable.transactionalAppend(kept, tableDir, appId, batchId)
        ()
      }
      .start()
}
