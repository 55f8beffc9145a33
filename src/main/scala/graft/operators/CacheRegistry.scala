package graft.operators

import org.apache.spark.sql.DataFrame

/** Lifecycle tracker for DataFrames an operator persists but whose
  * consuming action runs in the CALLER (e.g. the shingle/signature
  * intermediates in [[Dedup]] — they must stay cached until the
  * caller's write/collect, so the operator itself can never safely
  * unpersist them). Spark's CacheManager pins such blocks for the
  * session's lifetime otherwise, and a long session running the
  * near-dup family repeatedly (Bench, the test suite) would steadily
  * leak storage memory.
  *
  * Contract: operators register via [[track]]; whoever drives the
  * actions calls [[releaseAll]] once the results are materialized
  * (Bench and Verify do, after every query).
  */
object CacheRegistry {
  private val live = scala.collection.mutable.ArrayBuffer[DataFrame]()

  def track(df: DataFrame): DataFrame = synchronized { live += df; df }

  /** Unpersist (non-blocking) everything tracked since the last call. */
  def releaseAll(): Unit = synchronized {
    live.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    live.clear()
  }
}
