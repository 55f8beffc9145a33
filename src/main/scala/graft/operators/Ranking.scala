package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic GLOBAL ranking and balanced shard assignment — the
  * "split the corpus into N equal training shards" operator
  * (reference has no analog; this is north-star training-prep surface
  * alongside graft.operators.Packing).
  *
  * The naive global rank is `row_number() OVER (ORDER BY ...)`: a
  * single-partition window — one task sorts the entire corpus, the
  * exact shape that dies first at 100 TB. The naive fix
  * (repartitionByRange + partition offsets) needs an extra action to
  * count rows per range partition, and the range boundaries come from
  * a SAMPLING pass, so the counting action and the ranking action can
  * disagree unless the partitioned data is pinned with a cache — a
  * correctness hazard, not just a cost.
  *
  * This implementation is a two-phase HISTOGRAM rank with no action,
  * no cache, and no partitioner dependence:
  *
  *   1. value histogram: group by the rank value v → count(v). The
  *      histogram is DISTINCT-VALUE-sized, not corpus-sized (token
  *      counts, scores, and lengths have bounded range in practice).
  *   2. offsets: one unpartitioned window over the histogram computes
  *      `before(v)` = Σ count(u) for u ordered ahead of v. Single
  *      partition, but of the histogram — same pattern as the corpus
  *      total in q_unigram_logprob.
  *   3. rank = before(v) + row_number() over (partition by v, order by
  *      tie) — per-VALUE windows, parallelism = #distinct values.
  *
  * Every step is a deterministic function of the data (no
  * spark_partition_id, no sampling), so the rank is reproducible at
  * any partitioning — the property the histogram form buys over
  * zipWithIndex/repartitionByRange.
  *
  * Skew contract: a value held by a large fraction of the corpus makes
  * its per-value window a hot partition (same caveat as any
  * PARTITION BY). For such keys, extend the value with a coarse bucket
  * of the tie column so the histogram stays fine-grained.
  */
object Ranking {

  /** NULL rank values are FORBIDDEN, and loudly: the histogram join
    * below is a plain equi-join, under which a NULL value's rows would
    * not match any histogram bucket and silently VANISH from the
    * output — a dropped-rows bug masquerading as success. This guard
    * makes the contract runtime-checked at ~zero cost: assert_true is
    * a codegen'd per-row conditional that fails the job with this
    * message on the first NULL instead. (Callers with genuinely
    * nullable values choose their own policy first: filter the NULLs
    * out, or coalesce them to a sentinel that slots into the total
    * order.) */
  private def nonNullOrFail(c: Column, op: String): Column =
    when(assert_true(c.isNotNull,
      lit(s"$op: NULL rank value — (value, tie) must be a total order " +
        "over NON-NULL values; filter or coalesce NULLs first")).isNull, c)

  /** Global 1-based dense row rank by (`value` ordered per
    * `valueAscending`, then `tie` ascending). (`value`,`tie`) MUST be
    * a total order over the input (`tie` unique) — that is what makes
    * rank = histogram-offset + within-value rank exact. `value` must
    * be NON-NULL per row (runtime-enforced, see [[nonNullOrFail]]).
    * Output = input columns + `rn`. */
  def globalRank(df: DataFrame, value: Column, tie: Column,
                 valueAscending: Boolean = false,
                 rankName: String = "rn"): DataFrame = {
    val in = df.withColumn("__rk_v", nonNullOrFail(value, "globalRank"))
    val hist = in.groupBy("__rk_v").agg(count(lit(1)).as("__rk_c"))
    val histOrder = if (valueAscending) col("__rk_v").asc else col("__rk_v").desc
    val offsets = hist
      .withColumn("__rk_before",
        coalesce(
          sum("__rk_c").over(Window.orderBy(histOrder)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__rk_c")
    in.join(offsets, "__rk_v")
      .withColumn(rankName,
        col("__rk_before") +
          row_number().over(Window.partitionBy("__rk_v").orderBy(tie)))
      .drop("__rk_v", "__rk_before")
  }

  /** Global INCLUSIVE prefix sum of `mass` in (`value` ordered per
    * `valueAscending`, then `tie` ascending) order — the per-row
    * cumulative that Lorenz curves, ABC classes and quota cuts need,
    * built with the same two-phase histogram scheme as [[globalRank]]
    * (no corpus-wide single-partition window):
    *
    *   1. value histogram with per-value mass totals,
    *   2. one unpartitioned window over the HISTOGRAM for the
    *      before-this-value mass,
    *   3. per-VALUE running mass by `tie` — parallelism = #distinct
    *      values, the documented globalRank skew contract.
    *
    * (`value`,`tie`) MUST be a total order and `value` NON-NULL per
    * row (runtime-enforced, see [[nonNullOrFail]] — a NULL would
    * otherwise silently drop its row at the histogram join). Mass
    * should be DECIMAL for exact, order-free accumulation. Output =
    * input + `prefixName` (inclusive: a row's own mass is counted). */
  def globalPrefixMass(df: DataFrame, value: Column, tie: Column,
                       mass: Column, valueAscending: Boolean = false,
                       prefixName: String = "prefix"): DataFrame = {
    val in = df.withColumn("__pm_v", nonNullOrFail(value, "globalPrefixMass"))
      .withColumn("__pm_m", mass)
    val hist = in.groupBy("__pm_v").agg(sum("__pm_m").as("__pm_vm"))
    val histOrder = if (valueAscending) col("__pm_v").asc else col("__pm_v").desc
    val offsets = hist.withColumn("__pm_before",
        sum("__pm_vm").over(Window.orderBy(histOrder)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .drop("__pm_vm")
    in.join(offsets, "__pm_v")
      .withColumn(prefixName,
        coalesce(col("__pm_before"), lit(0).cast("decimal(38,6)")) +
          sum("__pm_m").over(Window.partitionBy("__pm_v").orderBy(tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__pm_v", "__pm_m", "__pm_before")
  }

  /** Balanced shard assignment by "snake" (boustrophedon) order:
    * rank docs by `value` DESC (largest first), then deal rank r to
    * shard `pos` on even passes and `k-1-pos` on odd passes
    * (pos = (r-1) mod k, pass = (r-1) div k). For any size
    * distribution this bounds the per-shard total-size spread by the
    * largest item in the second pass — the standard deterministic
    * alternative to greedy bin packing (which is inherently
    * sequential) for cutting N equal training shards.
    * Output = input columns + `rn` + `shard`. */
  def snakeShards(df: DataFrame, k: Int, value: Column, tie: Column): DataFrame = {
    require(k >= 1, s"shard count must be >= 1, got $k")
    // Snake via one modulus: m = (rn-1) mod 2k walks 0..2k-1 per
    // double-pass; the first half deals forward (shard m), the second
    // half backward (shard 2k-1-m). Integer-only — no `/` (Column `/`
    // is DOUBLE division) and bit-identical to the oracle's
    // (rn-1)//k parity form.
    val m = (col("rn") - 1) % (2 * k)
    globalRank(df, value, tie)
      .withColumn("shard",
        when(m < k, m).otherwise(lit(2 * k - 1) - m).cast("long"))
  }

  /** Reciprocal-rank fusion — the standard multi-retriever combiner
    * (dense ANN list ⊕ sparse BM25 list ⊕ …): each input carries
    * (`idCol`, `rankCol` 1-based); an id's fused score is
    * Σ over the lists that ranked it of floor(10⁹ / (c + rank)) —
    * RRF's rational 1/(c+rank) scaled to an EXACT integer per term,
    * so fused totals are aggregation-order-free and cross-engine
    * bit-stable (a double Σ here would make top-k boundaries
    * partitioning-dependent). Rank lists are k-bounded by
    * construction, so the union + groupBy is candidate-sized — the
    * fusion costs nothing next to the retrievers. Output:
    * (idCol, n_lists, rrf_ppb), top `k` by (rrf_ppb desc, id asc). */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: at least one ranked list")
    require(k >= 1 && c >= 0, s"rrfFuse: bad k=$k / c=$c")
    val scored = lists.map(df => df.select(col(idCol),
      // small-int double division is exact; floor matches the
      // oracle's identical expression
      floor(lit(1000000000.0) / (lit(c) + col(rankCol)))
        .cast("long").as("__rrf")))
    scored.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"), sum(col("__rrf")).as("rrf_ppb"))
      .orderBy(col("rrf_ppb").desc, col(idCol).asc)
      .limit(k)
  }
}
