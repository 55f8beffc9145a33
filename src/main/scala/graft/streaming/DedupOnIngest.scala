package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{CacheRegistry, Dedup}

/** Dedup-on-ingest: stamp every incoming document with the incremental
  * duplicate decision against a [[graft.operators.Dedup.writeMinhashIndex]]
  * base-corpus index, as a Structured Streaming sink stage.
  *
  * Why this streams cleanly where full dedup does not: the incremental
  * decision for a document depends ONLY on (that document, the static
  * base index) — never on other in-flight documents — so it is a pure
  * per-row function of the micro-batch and BATCH-SPLIT INVARIANT: any
  * partitioning of the same documents into micro-batches yields the
  * same stamps (pinned in EventStreamsSpec). Within-stream duplicates
  * are out of scope by the same token (two new docs duplicating each
  * other but nothing in the base both pass) — that is the documented
  * incremental contract; the epoch-boundary re-index catches them.
  *
  * Mechanically each micro-batch signs itself map-only (the fused
  * MinHashSigs expression — no aggregation state), probes the bucketed
  * signature table (index side shuffle-free), and refines with exact
  * Jaccard against the index's gram side table; that join/aggregate
  * pipeline is batch API inside `foreachBatch`, the standard shape for
  * per-batch join work a streaming plan can't express in append mode.
  * Delivery is per-batch atomic parquet append: a retried batch can
  * re-append (at-least-once); stamps are deterministic per doc_id, so
  * downstream dedups on doc_id — same contract as the reference's
  * retry-free log-and-continue ingest (main.py:743-759), improved to
  * checkpointed replay. */
object DedupOnIngest {

  /** The per-batch decision — every batch doc stamped
    * (is_dup, n_matches, canonical, best_jaccard); q_incremental_dedup's
    * aggregation over [[Dedup.incrementalDupPairsIndexed]]. */
  def stampBatch(spark: SparkSession, batch: DataFrame, indexTable: String,
                 w: Int = 5, k: Int = 32, bands: Int = 8,
                 threshold: Double = 0.8,
                 registry: CacheRegistry = CacheRegistry.global): DataFrame = {
    val pairs = Dedup.incrementalDupPairsIndexed(spark, batch, indexTable,
      w, k, bands, threshold, registry)
    val agg = pairs.groupBy("i")
      .agg(count(lit(1)).as("n_matches"),
        min("j").as("canonical"),
        max("jaccard").as("best_jaccard"))
      .withColumnRenamed("i", "doc_id")
    batch.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_matches").isNotNull.as("is_dup"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("canonical"), col("best_jaccard"))
  }

  /** Start the streaming stamp: `docs` (a STREAMING DataFrame with
    * doc_id, text) → per-batch decisions appended to `outPath`.
    * Caller configures the trigger/termination on the returned query. */
  def start(spark: SparkSession, docs: DataFrame, indexTable: String,
            outPath: String, checkpointPath: String,
            w: Int = 5, k: Int = 32, bands: Int = 8,
            threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Per-batch registry: the delta signature/gram caches must die
        // with the batch or a long-running stream accretes executor
        // memory one micro-batch at a time.
        val reg = new CacheRegistry
        try stampBatch(spark, batch, indexTable, w, k, bands, threshold, reg)
          .write.mode("append").parquet(outPath)
        finally reg.releaseAll()
      }
      .start()
}
