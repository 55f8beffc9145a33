package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.SnapshotTable

/** EXACTLY-ONCE streaming sink into a [[SnapshotTable]]: each
  * micro-batch commits via [[SnapshotTable.transactionalAppend]] with
  * the batch id as the transaction version, so a replayed batch
  * (checkpoint recovery, foreachBatch retry) is a manifest-level no-op
  * — its rows land exactly once, closing the at-least-once gap the
  * plain parquet-append sinks in this package document
  * ([[DedupOnIngest]], [[AnnIngest]]: "a retried batch can
  * re-append"). The replay's orphaned data files are retired by
  * [[SnapshotTable.vacuum]].
  *
  * `appId` must be stable across restarts and unique per logical
  * stream into the table (two different streams appending to one
  * table use two app ids; one stream restarted from its checkpoint
  * keeps its id — exactly Structured Streaming's idempotent-sink
  * contract). */
object SnapshotSink {

  def start(df: DataFrame, tableDir: String, checkpointPath: String,
            appId: String, statsCols: Seq[String] = Nil): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotTable.transactionalAppend(batch, tableDir, appId, batchId,
          statsCols)
        ()
      }
      .start()

  /** EXACTLY-ONCE streaming UPSERT (CDC apply): each micro-batch is a
    * keyed [[SnapshotTable.transactionalMerge]] with the batch id as
    * the transaction version — matched keys are replaced, new keys
    * inserted, only files holding a matched key rewritten, and a
    * replayed batch is a manifest no-op. The stream's per-batch rows
    * must be key-unique (merge's classic precondition; aggregate
    * upstream — e.g. latest-per-key via max_by — when the raw feed
    * can repeat a key within one trigger). */
  def startMerge(df: DataFrame, tableDir: String, checkpointPath: String,
                 appId: String, keys: Seq[String]): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotTable.transactionalMerge(batch.sparkSession, tableDir,
          batch, keys, appId, batchId)
        ()
      }
      .start()
}
