package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Similarity

/** ANN-index-on-ingest: keep a [[Similarity.writeIvfIndex]] layout
  * current as vectors stream in — the micro-batch twin of
  * [[Similarity.appendIvf]], completing the incremental story the
  * MinHash index already has ([[DedupOnIngest]]).
  *
  * Why this streams cleanly: an IVF append is a pure per-row function
  * of (vector, the index's recorded quantizer) — no aggregation state,
  * no dependence on other in-flight vectors — so it is BATCH-SPLIT
  * INVARIANT: any partitioning of the same vectors into micro-batches
  * yields the same index contents (pinned in EventStreamsSpec), and
  * each micro-batch touches only its own vectors' `cell=` directories.
  * Probes ([[Similarity.ivfTopKIndexed]]) see appended vectors on
  * their next read with dynamic partition pruning intact — no rebuild,
  * no reader restart.
  *
  * Delivery is per-batch atomic parquet append: a retried batch can
  * re-append (at-least-once). Vectors are deterministic per vec_id, so
  * downstream consumers dedup on vec_id where exactly-once matters;
  * the epoch-boundary compaction/rebuild is the usual hygiene pass.
  * Cells that accrete many micro-batch files are exactly the
  * small-files case [[graft.sources.Warehouse.compactSmallFiles]]
  * exists for — run it per hot `cell=` directory from the janitor. */
object AnnIngest {

  /** Start the streaming append: `vectors` (a STREAMING DataFrame with
    * vec_id, embedding) → per-batch [[Similarity.appendIvf]] into the
    * index at `indexPath` (which must already exist — the quantizer
    * parameters come from its sidecar). Caller configures the
    * trigger/termination on the returned query. */
  def start(vectors: DataFrame, indexPath: String,
            checkpointPath: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.appendIvf(batch, indexPath)
      }
      .start()

  /** EXACTLY-ONCE streaming ANN ingest — [[start]]'s at-least-once
    * caveat closed: the index is a
    * [[graft.sources.SnapshotTable]] ([[Similarity.initIvfSnapshot]]
    * layout) and each micro-batch lands through
    * [[Similarity.appendIvfSnapshot]] under the table's per-appId
    * transaction ledger with batchId as the transaction version — a
    * checkpoint-recovery replay of any micro-batch is a manifest
    * no-op (its rewritten data files stay as vacuumable orphans), so
    * the index holds each vector exactly once with NO downstream
    * dedup requirement. Probes ([[Similarity.ivfTopKSnapshot]]) are
    * snapshot-isolated manifest reads pruned to the probed cells.
    * EventStreamsSpec pins replay no-ops and batch-split
    * invariance. */
  def startExactlyOnce(vectors: DataFrame, tableDir: String,
                       appId: String,
                       checkpointPath: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.appendIvfSnapshot(batch, tableDir, appId, batchId)
        ()
      }
      .start()

  /** [[startExactlyOnce]] for the COMPRESSED index: micro-batches
    * encode through the [[graft.operators.Pq.initIvfPqSnapshot]]
    * table's recorded quantizer pair and land via the same
    * transaction-ledger discipline — each vector's CODES exist in the
    * index exactly once no matter how many times a batch replays.
    * Same batch-split invariance argument: encoding is a pure per-row
    * function of (vector, sidecar quantizers). */
  def startExactlyOncePq(vectors: DataFrame, tableDir: String,
                         appId: String,
                         checkpointPath: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Pq.appendIvfPqSnapshot(batch, tableDir, appId, batchId)
        ()
      }
      .start()
}
