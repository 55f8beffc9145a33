package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("bins"). True bin packing (first-fit-decreasing) is
  * inherently sequential; large-scale pipelines instead pack
  * CONTIGUOUSLY — order documents deterministically inside a shard,
  * run a prefix sum of token counts, and cut bins every `budget`
  * tokens, letting a document straddle a boundary (the trainer splits
  * or drops the tail token-side). That formulation is one window
  * prefix-sum — integer-only, reproducible, and oracle-checkable.
  *
  * Scale: the window partitions by the shard column, so parallelism =
  * #shards and one shard's token stream sorts on one task. Shards are
  * how real pipelines bound this (a few GB of text per shard); for a
  * skewed shard column, pre-split it (e.g. hash(doc_id) % k appended
  * to the shard key) — bin ids then number per (shard, split), which
  * is what a per-worker data loader consumes anyway.
  */
object Packing {

  /** Contiguous packing of `docs` into `budget`-token bins per shard.
    *
    * Output columns: doc_id, `shardCol`, n_tokens, cum_tokens (prefix
    * sum INCLUSIVE of this doc), bin_id (bin where this doc STARTS,
    * 0-based), bin_offset (token offset of this doc inside that bin).
    * All integer arithmetic — bit-identical across engines. */
  def contiguousPack(docs: DataFrame, budget: Int,
                     shardCol: String = "lang",
                     orderCol: String = "doc_id",
                     tokens: Column = size(split(col("text"), " "))): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col(shardCol), tokens.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("start", col("cum_tokens") - col("n_tokens"))
      // `div`, not floor(double /): a prefix sum past 2^53 tokens
      // would misround in double space — integral division keeps the
      // "bit-identical across engines" contract true at any scale.
      .withColumn("bin_id", expr(s"start div $budget"))
      .withColumn("bin_offset", col("start") % budget)
      .drop("start")
  }
}
