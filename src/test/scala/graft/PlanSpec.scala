package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Queries

/** Physical-plan shape assertions: the properties that make these
  * queries survive a 100× scale-up are plan properties, so pin them —
  * a regression that silently turns a broadcast join into a
  * sort-merge, or un-pushes a filter, fails here rather than in a
  * 10×-slower bench. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_proj_filter: predicates and projection reach the parquet scan") {
    val p = plan("q_proj_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // Only the needed columns are read (5 of 11).
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_orderkey"), s"scan reads unneeded column:\n$p")
  }

  test("q_results_topk: top-k via TakeOrderedAndProject, no global sort") {
    val p = plan("q_results_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("\nSort "), p)
  }

  test("q_topk_global: TakeOrderedAndProject with column pruning") {
    val p = plan("q_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("o_orderdate"), s"scan reads unneeded column:\n$p")
  }

  test("q_join_broadcast: both dims broadcast, no shuffle on the fact side") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_join_semi / q_join_anti plan as semi/anti hash joins") {
    assert(plan("q_join_semi").contains("LeftSemi"), plan("q_join_semi"))
    assert(plan("q_join_anti").contains("LeftAnti"), plan("q_join_anti"))
  }

  test("q_agg_group: partial (map-side) aggregation before the shuffle") {
    val p = plan("q_agg_group")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"no partial aggregation found:\n$p")
  }

  test("q_agg_group and q_proj_filter run inside whole-stage codegen") {
    // AQE finalizes the physical plan lazily — execute first, then the
    // same executedPlan renders the final (codegen-annotated) plan.
    Seq("q_agg_group", "q_proj_filter").foreach { q =>
      val df = Queries.queries(q)(spark, dir)
      df.collect()
      // Codegen spans render as "*(n) " stage prefixes in the final plan.
      assert(df.queryExecution.executedPlan.toString.contains("*("),
        s"$q final plan lacks whole-stage-codegen spans:\n${df.queryExecution.executedPlan}")
    }
  }

  test("q_ann_topk: the query side is broadcast") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_ann_ivf: cell-restricted join is an equi (hash) join, not a loop") {
    val p = plan("q_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_asof_join: one window, no join operator at all") {
    val p = plan("q_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
  }

  test("q_range_join: bucketed equi-join, never a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q_upload_admission: permission probe is a broadcast join") {
    // shares is metadata-sized; the gate must be map-side at any scale
    // (no shuffle of the request payloads for the permission check).
    val p = plan("q_upload_admission")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("near-dup family: candidate equi-joins only, never a product") {
    // The entire family's 100 TB viability rests on candidates meeting
    // on equi-join keys (shingle hash / band / cell) — a regression to
    // a cartesian or nested-loop join is the scale-killer.
    Seq("q_near_dup", "q_dedup_minhash", "q_dedup_simhash",
        "q_embed_near_dup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q:\n$p")
    }
  }

  test("q_scalar_subquery: decorrelated to an aggregate + join, no per-row loop") {
    // RewriteCorrelatedScalarSubquery must turn the per-row subquery
    // into min-aggregate + equi-join; a NestedLoop or per-row subquery
    // execution would be O(n) scans of orders.
    val p = plan("q_scalar_subquery")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(p.contains("Join"), s"decorrelation should plan a join:\n$p")
  }

  test("q_conditional_agg: one scan, one aggregate — no Expand, no join") {
    // Every FILTER-style conditional accumulator rides the SAME hash
    // aggregate (count_if / sum(CASE)); a second scan or an Expand
    // (the grouping-sets shape) would double the 100 TB read.
    val p = plan("q_conditional_agg")
    assert(!p.contains("Join") && !p.contains("Expand"), p)
    assert(p.contains("partial_"), s"needs map-side partial agg:\n$p")
    assert(p.sliding("FileScan".length).count(_ == "FileScan") <= 1,
      s"must scan orders once:\n$p")
  }

  test("q_vocab_topk: map-side combine + TakeOrderedAndProject for the cut") {
    val p = plan("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_"), s"token counts must combine map-side:\n$p")
  }

  test("q_window_range / q_token_entropy: single shuffle, no join") {
    Seq("q_window_range", "q_token_entropy").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("q_histogram: one scan into one map-side-combined aggregate") {
    val p = plan("q_histogram")
    assert(!p.contains("Join") && !p.contains("Expand"), p)
    assert(p.contains("partial_"), s"needs map-side partial agg:\n$p")
  }

  test("q_bigram_pmi: bigram extraction is map-only (no Window), totals broadcast") {
    val p = plan("q_bigram_pmi")
    assert(!p.contains("Window"),
      s"bigrams must come from a row-local array transform:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus totals must ride a broadcast, not a shuffle:\n$p")
  }

  test("q_skew_join: equi-join on the salted key, never a product") {
    val p = plan("q_skew_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q_text_search: shingle IN-filter applied before the aggregate, top-k sort") {
    val p = plan("q_text_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gram generation is map-only: no Window operator in the shingle family") {
    // Round 4 moved shingle generation scan-side (WordGramHashes /
    // per-doc gram arrays): a Window reappearing in these plans means
    // the corpus-wide tokenize shuffle snuck back in.
    Seq("q_near_dup", "q_near_dup_char", "q_repetition_stats",
        "q_decontaminate", "q_text_search", "q_dedup_minhash").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q must not pay a window shuffle for gram generation:\n$p")
    }
  }

  test("q_decontaminate: eval side broadcast, train side map-only to the probe") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"eval shingles must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the training corpus must not shuffle into a merge join:\n$p")
  }

  test("q_seq_pack: one scan, one shard-partitioned window, no join") {
    val p = plan("q_seq_pack")
    assert(p.split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      s"documents must be scanned exactly once:\n$p")
    assert(!p.contains("Join"), s"packing is windowing, not joining:\n$p")
  }

  test("q_label_centroids: partial (map-side) aggregation before the shuffle") {
    val p = plan("q_label_centroids")
    assert(p.contains("partial_"), s"no partial aggregation found:\n$p")
  }

  test("q_class_weights: ONE scan of documents, no driver-side count job") {
    // The grand total must ride the per-class agg (window over #classes
    // rows), not a second scan or a collected scalar — at 100 TB a
    // second scan doubles the job and a driver count() serializes it.
    val p = plan("q_class_weights")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans >= 1, s"expected a documents scan in:\n$p")
    assert(p.split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      s"documents must be scanned exactly once:\n$p")
  }

  test("q_repetition_stats: ONE scan, partial aggregation, no join") {
    // Both gram orders must come off a single token stream — a second
    // documents scan doubles the I/O of the cheapest filter in the
    // pipeline; the stacked (ord, gram) agg must combine map-side.
    val p = plan("q_repetition_stats")
    assert(p.split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      s"documents must be scanned exactly once:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation found:\n$p")
    assert(!p.contains("Join"), s"gram pivot must not plan a join:\n$p")
  }

  test("q_domain_stats: one scan, map-side extraction into one hash agg") {
    val p = plan("q_domain_stats")
    assert(p.split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      s"documents must be scanned exactly once:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
  }

  test("q_dedup_cluster: pair generation stays equi-join only") {
    // The iterative CC rounds run at collect time; what's pinnable
    // statically is that the pair graph feeding them never degenerates
    // to a product — same invariant as the near-dup family.
    val p = plan("q_dedup_cluster")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q_grouping_sets: one Expand feeding one aggregate, dims broadcast") {
    // Arbitrary grouping sets must share a single pass like cube —
    // a per-set rescan would multiply the 100 TB read by #sets.
    val p = plan("q_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets must plan an Expand:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_pivot: pivot with declared values is one aggregate pass") {
    // No Expand, no distinct-discovery pass: the closed value list
    // compiles to conditional aggregates in a single hash agg.
    val p = plan("q_pivot")
    assert(p.contains("partial_"), s"no partial aggregation found:\n$p")
    assert(!p.contains("Expand"), s"declared-values pivot must not Expand:\n$p")
  }

  test("q_sliding_window: window replication keeps map-side partial agg") {
    val p = plan("q_sliding_window")
    assert(p.contains("partial_"), s"no partial aggregation found:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q_tfidf / q_fuzzy_match: bounded sides broadcast, no product") {
    // The corpus-size row (1 row) and the brand dictionary (O(brands))
    // must attach via broadcast; a CartesianProduct means the bounded
    // side stopped being recognized as broadcastable.
    Seq("q_tfidf", "q_fuzzy_match").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q must broadcast its bounded side:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("q_pii_redact: map-only redaction — one scan, no hash shuffle") {
    // Redaction is per-row string work: the only exchange allowed is
    // the range partitioning for the deterministic ORDER BY. A
    // hashpartitioning exchange would mean an accidental aggregate or
    // join crept into a scrubber that must scale as a pure map.
    val p = plan("q_pii_redact")
    assert(p.split("\n").count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) == 1,
      s"documents must be scanned exactly once:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"redaction must not hash-shuffle:\n$p")
  }

  test("q_decontaminate_flag: map-only stamp, no hash shuffle") {
    // The whole point of the flag form is statelessness: the eval set
    // rides as a referenced object inside the probe expression, so the
    // plan must contain no hash exchange (the only exchange is the
    // final ORDER BY's range partitioning) and exactly one corpus
    // scan.
    val p = plan("q_decontaminate_flag")
    assert(!p.contains("hashpartitioning"),
      s"flag stamp must not hash-shuffle:\n$p")
    assert(p.split("\n").count(_.contains("FileScan parquet")) == 1,
      s"documents must be scanned exactly once in the streamed plan:\n$p")
  }

  test("q_heavy_hitters: sketch via ObjectHashAggregate, pass-2 candidates broadcast") {
    // The MG sketch is a TypedImperativeAggregate: it must plan as
    // ObjectHashAggregate (SortAggregate would sort the whole corpus
    // to feed an order-insensitive O(k) sketch), and the pass-2 refine
    // must join the candidate set by BROADCAST — a shuffled join here
    // would defeat the no-full-cardinality-shuffle point of the
    // two-pass pattern.
    val p = plan("q_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"),
      s"MG sketch must plan as ObjectHashAggregate:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"pass-2 candidate join must broadcast:\n$p")
  }

  private def shuffledStringArrays(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.output.exists(a => a.dataType ==
          org.apache.spark.sql.types.StringType ||
          a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]) => e
    }

  test("q_passage_dedup / q_dup_ngram_frac: no text, token array or gram string in any exchange") {
    // Both queries reduce text to 8-byte hashes scan-side; every
    // exchange must carry only scalar hash/count columns. A string or
    // array column in a shuffle means the row-local hashing regressed
    // into shuffling corpus text — the exact failure mode these
    // formulations exist to prevent at 100 TB.
    Seq("q_passage_dedup", "q_dup_ngram_frac").foreach { q =>
      val df = Queries.queries(q)(spark, dir)
      val bad = shuffledStringArrays(df)
      assert(bad.isEmpty,
        s"$q shuffles text/arrays:\n${bad.mkString("\n")}")
    }
  }

  test("q_lang_divergence: corpus-total window runs over the vocab aggregate, not the corpus") {
    // The unpartitioned (SinglePartition) window computes the corpus
    // token total: it must consume the vocab-sized (tok, cc) aggregate
    // — never rows still carrying doc/lang-level cardinality. The
    // vocab rows carry only the aggregated count columns.
    val p = plan("q_lang_divergence")
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    assert(single.nonEmpty, s"expected the corpus-total window:\n$p")
    assert(!single.exists(_.contains("lang")),
      s"lang-level rows entered a single partition:\n$p")
  }

  test("q_incremental_dedup: banded probe is delta-vs-base — no corpus self-join") {
    // The incremental contract in plan form: documents is scanned for
    // the base side and the delta side with DISJOINT pushed filters
    // (the mod-5 split), so no join input ever contains both sides of
    // the same scan — the shape that keeps the base corpus from
    // meeting itself.
    val p = plan("q_incremental_dedup")
    assert(p.contains("PushedFilters"), p)
    // Every documents scan carries a pushed IsNotNull/text or doc_id
    // filter — and the plan never broadcasts or joins a full unsplit
    // documents scan (no scan line without a Filter above it feeds a
    // join directly). Weak proxy, strong signal: assert the split
    // predicate appears in the plan at least twice (once per side).
    val occurrences = "pmod\\(doc_id#\\d+L?, 5\\)".r.findAllIn(p).length
    assert(occurrences >= 2,
      s"expected the mod-5 split predicate on both sides:\n$p")
  }

  test("q_group_topk: bounded-heap aggregate, no window sort anywhere") {
    val p = plan("q_group_topk")
    assert(p.contains("ObjectHashAggregate"),
      s"top_k_by must plan as ObjectHashAggregate:\n$p")
    assert(p.contains("partial_top_k_by"),
      s"the heap must combine map-side before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"the whole point is NO per-group window sort:\n$p")
  }

  test("q_unpivot: row-local Expand, only the output sort exchanges") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"),
      s"unpivot must plan as the row-local Expand:\n$p")
    // The melt itself moves nothing; the single exchange is the
    // final ORDER BY's range partitioning.
    assert(p.split("Exchange").length - 1 <= 1,
      s"expected at most the sort exchange:\n$p")
    assert(p.contains("PushedFilters"), s"partkey filter not pushed:\n$p")
  }

  test("q_skyline: the only single-partition window runs over the length histogram") {
    // The skyline must reduce to the histogram form — a
    // SinglePartition window whose child carries (n_chars, mq), never
    // the corpus rows (doc_id would appear in its schema otherwise).
    val p = plan("q_skyline")
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    assert(single.nonEmpty, s"expected the histogram prefix-max window:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("SinglePartition") && l.contains("doc_id")),
      s"corpus rows entered a single-partition exchange:\n$p")
  }

  test("q_weighted_sample: bounded-heap sampler, no window, key folds scan-side") {
    // Efraimidis-Spirakis per-stratum sampling must plan as the
    // map-side-combined heap aggregate — the property that makes a
    // weighted corpus cut one scan at 100 TB — never as a per-group
    // window sort over the corpus.
    val p = plan("q_weighted_sample")
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_top_k_by"),
      s"sampler must be the map-side-combined heap aggregate:\n$p")
    assert(!p.contains("Window"),
      s"no per-group window sort in the sampling path:\n$p")
    // Only the 3 needed columns reach the scan.
    assert(!p.contains("text"), s"scan reads unneeded text column:\n$p")
  }

  test("q_bloom_decontaminate: map-only bloom gate, candidate joins equi-only") {
    val p = plan("q_bloom_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"refine must stay an equi-join:\n$p")
    // The bloom prefilter must sit in a Filter ABOVE a documents scan
    // (map-only phase 1), not after any join.
    assert(p.contains("bloomlongscontainany") || p.contains("BloomLongsContainAny"),
      s"bloom probe expression missing from the plan:\n$p")
  }

  test("q_link_rank: top-20 via TakeOrderedAndProject, nodes/edges cached once") {
    try {
      val p = plan("q_link_rank")
      assert(p.contains("TakeOrderedAndProject"), p)
      assert(!p.contains("CartesianProduct"), s"unbounded product:\n$p")
      // Persisted node/edge tables: iterations must read
      // InMemoryTableScan, not re-derive the edge table from the
      // source scans. (The scan text still appears under each
      // InMemoryTableScan — it prints the cached subtree — so presence
      // of the cache node is the signal, not the textual scan count.)
      assert(p.contains("InMemoryTableScan"),
        s"iterations must reuse cached nodes/edges:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_funnel: stages share ONE user exchange — no self-joins, no re-sort") {
    val p = plan("q_funnel")
    assert(!p.contains("Join"), s"funnel must not self-join per stage:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"window passes + final agg must share one exchange, found $exchanges:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_event_pairs: pair expansion is row-local — no corpus self-join") {
    try {
      val p = plan("q_event_pairs")
      // Pairs come from exploding the per-user set twice; the only joins
      // are the vocabulary-sized marginals and the single-row total.
      assert(!p.contains("SortMergeJoin"),
        s"pairs must explode row-locally, not merge-join the corpus:\n$p")
      assert(p.contains("Generate explode"), s"expected the explode:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"the per-user set table must be cached, not re-derived:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_upsert_latest: declarative max_by combines map-side — no window sort") {
    val p = plan("q_upsert_latest")
    // Specifically partial_max_by: a bare partial_ would be satisfied
    // by the always-present partial count for n_versions.
    assert(p.contains("partial_max_by"),
      s"latest-row pick must partial-aggregate before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"CDC compaction must not sort every version per key:\n$p")
  }

  test("q_gap_fill: day spine explodes per key — no calendar product") {
    val p = plan("q_gap_fill")
    assert(p.contains("Generate explode"), s"expected the day-spine explode:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"densification must stay a co-keyed equi-join:\n$p")
  }

  test("q_retention: one corpus scan, row-local cohort, cached matrix") {
    try {
      val p = plan("q_retention")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"the matrix must come from equi-joins:\n$p")
      // BOTH matrix consumers (cells + offset-0 sizes) read the
      // persisted matrix — the cache builds from one events scan, so
      // two InMemoryTableScan nodes IS the one-scan proof. (A textual
      // FileScan count would lie here: each InMemoryTableScan prints
      // its cached subtree, events scan included.)
      val cacheReads = p.linesIterator.count(_.contains("InMemoryTableScan"))
      assert(cacheReads >= 2,
        s"both matrix consumers must read the cache, found $cacheReads:\n$p")
      // And the cohort is row-local (array_min over the per-user set),
      // not a join back to a second aggregation.
      assert(p.contains("array_min"), s"expected the row-local cohort:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_chunk: chunking is map-only — one scan, no join, no agg exchange") {
    val p = plan("q_chunk")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(p.contains("Generate explode"), s"expected the chunk-index explode:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"documents must be scanned once, found $scans:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"only the output ordering may exchange, found $exchanges:\n$p")
  }

  test("q_running_distinct: both windows share ONE user exchange") {
    // The COUNT(DISTINCT) OVER rewrite only beats the naive
    // set-per-row form if the flag window and the running-sum window
    // cluster on the same key: one hash exchange, two in-partition
    // sorts. A second hashpartitioning means the (user, type) flag
    // window stopped riding the user_id clustering.
    val p = plan("q_running_distinct")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"flag + running-sum windows must share one exchange, found $exchanges:\n$p")
    assert(!p.contains("Join"), s"no join belongs in this rewrite:\n$p")
  }

  test("q_transition: marginal window runs over the vocab² aggregate, not the corpus") {
    // The row-normalizing sum must consume the (from, to) count table
    // (vocabulary² rows, post-aggregate) — a corpus-cardinality input
    // to that window means the no-join-back shortcut regressed.
    val p = plan("q_transition")
    assert(!p.contains("Join"), s"marginals must not join back:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_count"),
      s"pair counts must combine map-side before their exchange:\n$p")
  }

  test("q_rfm: thresholds broadcast back; the fact side shuffles once") {
    try {
      val p = plan("q_rfm")
      // Single-row max-date and threshold vectors arrive via broadcast
      // (nested-loop on a 1-row side is the broadcast scalar pattern).
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"thresholds must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"nothing in RFM justifies a sort-merge join:\n$p")
      // One per-customer aggregation is the only fact-side hash
      // exchange; binning afterwards is map-only over the cached rows.
      assert(p.contains("InMemoryTableScan"),
        s"threshold pass and bin pass must reuse the cached per-customer table:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_cluster_sizes: only digests shuffle; denominator window is histogram-sized") {
    val df = Queries.queries("q_cluster_sizes")(spark, dir)
    val bad = shuffledStringArrays(df)
    // The md5 digest (32-char string) is the ONLY string allowed into
    // an exchange — text and token arrays must be reduced scan-side.
    val nonDigest = bad.filterNot(_.output.forall(a =>
      a.name == "h" || !(a.dataType ==
        org.apache.spark.sql.types.StringType ||
        a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])))
    assert(nonDigest.isEmpty,
      s"q_cluster_sizes shuffles text/arrays:\n${nonDigest.mkString("\n")}")
    val p = df.queryExecution.executedPlan.toString
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    assert(single.nonEmpty, s"expected the histogram-total window:\n$p")
    assert(!single.exists(_.contains("text")),
      s"corpus rows entered the single-partition window:\n$p")
  }

  test("q_rolling_median: bounded ROWS frame over the daily aggregate") {
    val p = plan("q_rolling_median")
    // The collect_list is legitimate ONLY because the frame is ≤7
    // rows: pin the bounded frame (-6, currentrow) so an unbounded
    // frame regression (growing per-row state) can't slip in.
    assert(p.contains("-6") && p.toLowerCase.contains("currentrow"),
      s"expected the bounded 7-row frame:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts must combine map-side before the window:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
  }

  test("q_streak: islands via window arithmetic — no join, user-clustered exchanges") {
    val p = plan("q_streak")
    assert(!p.contains("Join"),
      s"gaps-and-islands must not self-join:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
    // Every hash exchange carries (user, day)-grade rows — no text,
    // no arrays.
    val bad = shuffledStringArrays(Queries.queries("q_streak")(spark, dir))
    assert(bad.isEmpty, s"q_streak shuffles wide rows:\n${bad.mkString("\n")}")
  }

  test("q_rolling_stats: one user exchange, strictly-trailing bounded frame") {
    val p = plan("q_rolling_stats")
    assert(!p.contains("Join"), s"lag features must not join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"all three moment windows must share one exchange, found $exchanges:\n$p")
    // The no-leakage contract in plan form: the frame ends at
    // 1 PRECEDING (upper bound -1), never at currentrow.
    assert(p.contains("-10") && p.contains("-1"),
      s"expected the strictly-trailing (-10, -1) frame:\n$p")
  }

  test("q_dedup_keep_best: declarative max_by canonical pick, digest-only shuffles") {
    val p = plan("q_dedup_keep_best")
    assert(p.contains("partial_max_by"),
      s"canonical pick must combine map-side before the exchange:\n$p")
    assert(!p.contains("Window"),
      s"keep-best must not window-sort the corpus:\n$p")
    // Text never shuffles: every exchange's only string column is the
    // 32-byte digest h.
    val bad = shuffledStringArrays(Queries.queries("q_dedup_keep_best")(spark, dir))
    val nonDigest = bad.filterNot(_.output.forall(a =>
      a.name == "h" || !(a.dataType ==
        org.apache.spark.sql.types.StringType ||
        a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])))
    assert(nonDigest.isEmpty,
      s"q_dedup_keep_best shuffles text/arrays:\n${nonDigest.mkString("\n")}")
  }

  test("q_weekday_profile: aggregate-of-aggregates, one scan, both layers combine map-side") {
    val p = plan("q_weekday_profile")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"both aggregation layers must combine map-side:\n$p")
  }

  test("q_null_profile: five columns profile in ONE scan via Expand, then unpivot") {
    val p = plan("q_null_profile")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1,
      s"multi-COUNT(DISTINCT) must plan as one Expand pass over one scan, found $scans:\n$p")
    assert(p.contains("Expand"),
      s"expected the multi-distinct Expand:\n$p")
    assert(p.contains("Generate stack") || p.contains("stack("),
      s"expected the stack() unpivot:\n$p")
    assert(!p.contains("Join"), s"profiling must not join:\n$p")
  }

  test("q_prefix_join: candidates meet on gram equality only, grams stay cached") {
    try {
      val p = plan("q_prefix_join")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"prefix filtering must stay equi-join only:\n$p")
      assert(!p.contains("Window"),
        s"no window sort belongs in the prefix pipeline:\n$p")
      // The per-doc gram arrays are persisted once and read by the
      // prefix build and both refine sides.
      assert(p.contains("InMemoryTableScan"),
        s"gram arrays must be cached, not re-derived per consumer:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_key_skew: per-key counts combine map-side; summary is one tiny row") {
    val p = plan("q_key_skew")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"lineitem must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_count"),
      s"per-key counts must combine map-side before the exchange:\n$p")
  }

  test("q_bm25: corpus scalars broadcast; doc window bounded; tf/df combine map-side") {
    val p = plan("q_bm25")
    // N and avgdl ride a single-row broadcast — a SortMergeJoin here
    // would mean the corpus shuffles against a 1-row table.
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus stats must broadcast:\n$p")
    assert(p.contains("partial_count"),
      s"tf/df must combine map-side:\n$p")
  }

  test("q_ohlc: both pick windows and the bar aggregate share one day-key exchange") {
    val p = plan("q_ohlc")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"open/close windows + OHLC agg must ride ONE (type, day) exchange, found $exchanges:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_autocorr: corpus reduces to daily counts before any window; no join") {
    val p = plan("q_autocorr")
    assert(!p.contains("Join"), s"power sums need no join:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts must combine map-side before the first exchange:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_chi_square: dims broadcast into the grid; no corpus-keyed sort-merge") {
    val p = plan("q_chi_square")
    assert(!p.contains("SortMergeJoin"),
      s"the bounded lang×source grid must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast dim joins:\n$p")
  }

  test("q_user_growth: corpus reduces to user-day pairs before the global window") {
    try {
      val p = plan("q_user_growth")
      val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
      assert(single.nonEmpty, s"expected the day-level running-sum window:\n$p")
      // Only day-grade rows may enter the single-partition exchange —
      // never user-grade ones.
      assert(!single.exists(l => l.contains("user_id")),
        s"user-grade rows entered the global window:\n$p")
      // Both aggregation branches read the CACHED user-day table, not
      // the events scan.
      assert(p.contains("InMemoryTableScan"),
        s"user-day pairs must be cached, not re-scanned per branch:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_ewma: one ordered window serves all seven lags; no join") {
    val p = plan("q_ewma")
    assert(!p.contains("Join"), s"lag features must not join:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1,
      s"all lag columns must ride ONE window, found $windows:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts must combine map-side:\n$p")
  }

  test("q_triangles: equi-joins only — no cartesian; edge list cached for its consumers") {
    try {
      val p = plan("q_triangles")
      assert(!p.contains("CartesianProduct"),
        s"triangle counting must never go cartesian:\n$p")
      // The only BroadcastNestedLoopJoins allowed are the single-row
      // summary crossJoins; the wedge join itself must be hash/merge.
      assert(p.contains("InMemoryTableScan"),
        s"the edge build must be cached, not re-run per consumer:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_knn_label: scoring rides the broadcast query side, vote is bounded") {
    val p = plan("q_knn_label")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the 8 query vectors must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_diversity: aggregate-of-aggregates, one scan, map-side combined") {
    val p = plan("q_diversity")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"documents must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_count"),
      s"cell counts must combine map-side:\n$p")
  }

  test("q_benford: admission filter pushed to the scan; totals broadcast") {
    val p = plan("q_benford")
    assert(p.contains("PushedFilters: [") &&
      p.contains("GreaterThanOrEqual(o_totalprice"),
      s"price filter must push to parquet:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 1-row total must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join belongs here:\n$p")
  }

  test("q_tail_latency: one day-key exchange, percentiles partial-collected map-side") {
    val p = plan("q_tail_latency")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"expected one (type, day) exchange, found $exchanges:\n$p")
    assert(p.contains("partial_percentile"),
      s"percentile must partial-aggregate map-side:\n$p")
  }

  test("q_pareto: rank via value histogram — no customer-grade single-partition window") {
    val p = plan("q_pareto")
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    // globalRank's only single-partition window is over the VALUE
    // HISTOGRAM (distinct revenue values), never the customer rows:
    // the histogram rows carry __rk_v/__rk_c, not o_custkey.
    assert(!single.exists(_.contains("o_custkey")),
      s"customer rows entered a single-partition exchange:\n$p")
  }

  test("q_cohort_ltv: cumulative window is cohort-grade, revenue summed in decimal") {
    val p = plan("q_cohort_ltv")
    // The running-sum window partitions by cohort week over the
    // cohort×age aggregate — user- or event-grade rows must never
    // enter a window.
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"expected the cumulative window:\n$p")
    assert(!winLines.exists(_.contains("user_id")),
      s"user-grade rows entered the window:\n$p")
    assert(p.contains("sum(wrev"), s"revenue must aggregate before the window:\n$p")
  }

  test("q_session_stats: window, session agg and user agg share ONE user exchange") {
    val p = plan("q_session_stats")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"hash partitioning on user_id must serve the window AND both aggs, found $exchanges:\n$p")
  }

  test("q_ab_test: four counters in one conditional-agg pass — no join, one scan") {
    val p = plan("q_ab_test")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_sum"),
      s"the four counters must combine map-side:\n$p")
  }

  test("q_mutual_info: windows run over the cell table, never corpus rows") {
    val p = plan("q_mutual_info")
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    assert(single.nonEmpty, s"expected the cell-table marginal windows:\n$p")
    assert(!single.exists(_.contains("doc_id")),
      s"document rows entered a single-partition exchange:\n$p")
  }

  test("q_copurchase_components: equi-joins only through edge build and CC") {
    val p = plan("q_copurchase_components")
    assert(!p.contains("CartesianProduct"),
      s"component labeling must never go cartesian:\n$p")
  }

  test("q_readability: map-only feature extraction — no shuffle before the output sort") {
    val p = plan("q_readability")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-doc regex counts must not shuffle:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"documents must be scanned once, found $scans:\n$p")
  }

  test("q_top_movers: global top-10 via TakeOrderedAndProject, no full sort") {
    val p = plan("q_top_movers")
    assert(p.contains("TakeOrderedAndProject"),
      s"the movers cut must plan as a bounded heap:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts must combine map-side:\n$p")
  }

  test("q_regional_revenue: one fact shuffle, every dimension hop broadcast") {
    val p = plan("q_regional_revenue")
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 3,
      s"customer/nation/region hops must broadcast (found $bhj BHJ):\n$p")
    assert(!p.contains("SortMergeJoin") ||
      !p.linesIterator.exists(l => l.contains("SortMergeJoin") && l.contains("c_custkey")),
      s"dimension joins must not sort-merge:\n$p")
  }

  test("q_discount_lift: integer-keyed groupBy, map-side combined, one scan") {
    val p = plan("q_discount_lift")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"lineitem must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"level sums must combine map-side:\n$p")
  }

  test("q_order_gap: lag window and gap aggregate share the user exchange") {
    val p = plan("q_order_gap")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"window + groupBy must share ONE user exchange, found $exchanges:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(event_type,purchase"),
      s"purchase filter must push to parquet:\n$p")
  }

  test("q_anomaly_days: per-type stats broadcast back — the series never re-shuffles") {
    val p = plan("q_anomaly_days")
    assert(p.contains("BroadcastHashJoin"),
      s"the 5-row stats table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join belongs here:\n$p")
  }

  test("q_kfold: stratum windows then cell aggregate — corpus text never shuffles") {
    val p = plan("q_kfold")
    // Only (doc_id, lang)-grade rows move; the scan reads just the
    // two columns.
    assert(p.contains("ReadSchema") && !p.contains("text"),
      s"scan must read only doc_id/lang:\n$p")
    assert(!p.contains("SinglePartition"),
      s"folds are per-stratum — no global window belongs here:\n$p")
  }

  test("q_recall_at_k: both rank lists broadcast-bounded; eval join is k-bounded") {
    val p = plan("q_recall_at_k")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the 8 query vectors must broadcast into both scorers:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q_medoid: pair join blocks on label equality — never cross-label") {
    val p = plan("q_medoid")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"medoid pairs must meet on the label equi-key:\n$p")
    // The sample predicate reaches the scan.
    assert(p.contains("PushedFilters: ["), s"sample filter must push:\n$p")
  }

  test("q_gini: rank via value histogram — no customer-grade single-partition window") {
    val p = plan("q_gini")
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    assert(!single.exists(_.contains("o_custkey")),
      s"customer rows entered a single-partition exchange:\n$p")
  }

  test("q_freshness_decay: decay fold runs over the bounded daily table") {
    val p = plan("q_freshness_decay")
    assert(p.contains("partial_count"),
      s"daily counts must combine map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the global max-day must broadcast:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans <= 2, s"events must not be re-scanned per consumer, found $scans:\n$p")
  }

  test("q_segment_overlap: per-user sets cached; pairs explode row-locally") {
    try {
      val p = plan("q_segment_overlap")
      assert(p.contains("InMemoryTableScan"),
        s"the per-user set table must be cached, not re-derived:\n$p")
      assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    } finally graft.operators.CacheRegistry.global.releaseAll()
  }

  test("q_trend: power sums over the daily table — no join, map-side combined") {
    val p = plan("q_trend")
    assert(!p.contains("Join"), s"OLS from power sums needs no join:\n$p")
    assert(p.contains("partial_count"),
      s"daily counts must combine map-side:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_event_trigrams: sequences fold in the aggregate — no corpus window; top-10 is a bounded heap") {
    val p = plan("q_event_trigrams")
    assert(!p.contains("Window"),
      s"per-user ordering must happen inside array_sort, not a window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-10 cut must plan as a bounded heap:\n$p")
  }

  test("q_forecast_mape: one ordered window, no join") {
    val p = plan("q_forecast_mape")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = p.linesIterator.count(_.contains("windowspecdefinition"))
    assert(windows >= 1, s"expected the lag-7 window:\n$p")
  }

  test("q_capping: threshold broadcast back; sums in decimal") {
    val p = plan("q_capping")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the p99 threshold must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join belongs here:\n$p")
  }

  test("q_vocab_growth: first-seen via tok-keyed min agg — never a corpus-ordered window") {
    val p = plan("q_vocab_growth")
    assert(p.contains("partial_min"),
      s"first-occurrence must combine map-side:\n$p")
    val single = p.linesIterator.filter(_.contains("SinglePartition")).toSeq
    // Only decile-grade rows enter the global running-sum window.
    assert(!single.exists(_.contains("tok")),
      s"token rows entered a single-partition exchange:\n$p")
  }

  test("q_attribution: carry-forward window — no self-join, no per-channel pass") {
    val p = plan("q_attribution")
    assert(!p.contains("Join"),
      s"last-touch must be one window, not an as-of join per channel:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2,
      s"expected user window + channel agg only, found $exchanges exchanges:\n$p")
  }

  test("q_dwell_time: both lags ride one user window; pair agg is vocab-bounded") {
    val p = plan("q_dwell_time")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1,
      s"type and ts lags must share ONE window, found $windows:\n$p")
  }

  test("q_mix_shift: shares and lags over the daily aggregate only") {
    val p = plan("q_mix_shift")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_count"),
      s"daily cells must combine map-side:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_price_dispersion: decimal moments map-side combined; top-20 is a bounded heap") {
    val p = plan("q_price_dispersion")
    assert(p.contains("TakeOrderedAndProject"),
      s"the dispersion cut must plan as a bounded heap:\n$p")
    assert(p.contains("partial_sum"),
      s"per-part moments must combine map-side:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
  }

  test("q_repeat_rate: two stacked aggregates, one scan, pushed purchase filter") {
    val p = plan("q_repeat_rate")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(event_type,purchase"),
      s"purchase filter must push to parquet:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_scd2: change filter + interval close share ONE user exchange") {
    val p = plan("q_scd2")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2,
      s"lag/lead windows must share the user exchange (+state agg), found $exchanges:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 2,
      s"expected exactly the change-detect and interval-close windows, found $windows:\n$p")
  }

  test("q_ks_test: integer argmax via bounded heap; totals broadcast; no cartesian blow-up") {
    val p = plan("q_ks_test")
    assert(p.contains("TakeOrderedAndProject"),
      s"the argmax-1 must plan as a bounded heap:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian product belongs here:\n$p")
  }

  test("q_stickiness: one user-day dedup feeds both grains; month join broadcasts") {
    val p = plan("q_stickiness")
    assert(p.contains("BroadcastHashJoin"),
      s"the month-grade MAU table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"day-grade rows must never shuffle-join:\n$p")
  }

  test("q_cross_corr: daily series cached once; lag table broadcast; decimal power sums") {
    val p = plan("q_cross_corr")
    // NB the InMemoryRelation node re-displays its child FileScan, so
    // count cache hits, not scan text: both join sides must read the
    // cached daily table instead of re-aggregating events.
    val hits = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(hits >= 2,
      s"both sides of the lag join must reuse the cached daily table, found $hits hits:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 8-row lag explode must broadcast, not cartesian:\n$p")
  }

  test("q_zipf: corpus work ends at the top-1000 heap; regression runs on the bounded set") {
    val p = plan("q_zipf")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-1000 cut must plan as a bounded heap:\n$p")
    // The ranking window sits directly on TakeOrderedAndProject's
    // single output partition — no Exchange SinglePartition needed,
    // and the corpus-grade token rows never enter a window.
    assert(!p.contains("Exchange SinglePartition"),
      s"the heap output is already one partition — no exchange belongs here:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1,
      s"expected exactly the bounded ranking window, found $windows:\n$p")
    assert(p.contains("partial_count"),
      s"term counts must combine map-side:\n$p")
  }

  test("q_changepoint: integer argmax via bounded heap; totals broadcast; one events scan") {
    val p = plan("q_changepoint")
    assert(p.contains("TakeOrderedAndProject"),
      s"the argmax-1 must plan as a bounded heap:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row totals must broadcast:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2,
      s"events feeds the daily agg and its totals only, found $scans scans:\n$p")
  }

  test("q_containment: same candidate shape as the jaccard family — no window, hashes-only shuffles") {
    val p = plan("q_containment")
    assert(!p.contains("Window"),
      s"the shingle family never uses a window:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidates must meet on gram-hash equi-joins:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_clustering_coef: oriented wedge join — equi-joins only, bounded-heap cut") {
    val p = plan("q_clustering_coef")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must plan as a bounded heap:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"triangle closing must be equi-joins only:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"edge/oriented tables must come from the cache registry:\n$p")
  }

  test("q_new_vs_returning: user-keyed first-day join; one day-grade aggregate") {
    val p = plan("q_new_vs_returning")
    assert(p.contains("PushedFilters: [") &&
      p.contains("EqualTo(event_type,purchase"),
      s"purchase filter must push to parquet:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the first-day attach must be an equi-join:\n$p")
  }

  test("q_assortativity: node-keyed degree joins; single-row closing aggregate") {
    val p = plan("q_assortativity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"degree attachment must be equi-joins:\n$p")
    assert(p.contains("partial_sum"),
      s"power sums must combine map-side:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("q_rolling_dau: bounded day-explode, broadcast day clip, no per-day rescan") {
    val p = plan("q_rolling_dau")
    assert(p.contains("BroadcastHashJoin"),
      s"the day-list clip must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no shuffle join belongs in the window clip:\n$p")
    assert(!p.contains("Window"),
      s"sliding distinct must use the day-explode, not a window:\n$p")
  }

  test("q_cross_source_dup: candidate machinery unchanged; source attach is doc-keyed") {
    val p = plan("q_cross_source_dup")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_degree_dist: integer log2 bucketing, bounded bin window, broadcast total") {
    val p = plan("q_degree_dist")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row node total must broadcast:\n$p")
    assert(!p.contains("log2") && !p.contains("LOG2"),
      s"bucketing must be exact integer bin-length, not float log:\n$p")
  }

  test("q_sla_attainment: one order-key join, priority-grade aggregate") {
    val p = plan("q_sla_attainment")
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"exactly the orders-lineitem join, found $joins:\n$p")
    assert(p.contains("partial_count"),
      s"attainment counts must combine map-side:\n$p")
  }

  test("q_burstiness: integer power sums, no window, one events scan") {
    val p = plan("q_burstiness")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_dedup_impact: digest-keyed shuffles, text never leaves the scan") {
    val p = plan("q_dedup_impact")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the survivor attach must be an equi-join:\n$p")
  }

  test("q_ngram_novelty: hashes-only shuffles, first-holder min combines map-side") {
    val p = plan("q_ngram_novelty")
    assert(p.contains("partial_min"),
      s"first-holder table must combine map-side:\n$p")
    assert(!p.contains("Window"),
      s"the shingle family never uses a window:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_length_profile: one scan, one lang aggregate, exact percentiles partial") {
    val p = plan("q_length_profile")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_percentile"),
      s"exact percentiles must combine map-side:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"documents must be scanned once, found $scans:\n$p")
  }

  test("q_price_elasticity: part dim broadcast; integer OLS sums map-side") {
    val p = plan("q_price_elasticity")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"lineitem must not shuffle for the dim attach:\n$p")
    assert(p.contains("partial_sum"),
      s"OLS sums must combine map-side:\n$p")
  }

  test("q_abc_class: histogram-sized rank window, broadcast total, no corpus sort") {
    val p = plan("q_abc_class")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row total must broadcast:\n$p")
    // The only unpartitioned window runs over the value histogram
    // (globalRank contract); the per-part windows partition by value.
    assert(p.contains("windowspecdefinition(__pm_v"),
      s"per-part prefix must ride globalPrefixMass's per-value windows:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 2,
      s"expected histogram-offset + in-value-rank windows only, found $windows:\n$p")
  }

  test("q_seasonal_strength: type totals broadcast onto weekday groups; one events scan path") {
    val p = plan("q_seasonal_strength")
    assert(p.contains("BroadcastHashJoin"),
      s"the type-totals table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"weekday groups must not shuffle-join:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("q_basket_size_dist: two stacked aggregates, no join, one scan") {
    val p = plan("q_basket_size_dist")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"lineitem must be scanned once, found $scans:\n$p")
    assert(p.contains("partial_count"),
      s"per-order counts must combine map-side:\n$p")
  }

  test("q_langid_eval: metric joins ride the langs-bounded confusion matrix") {
    val p = plan("q_langid_eval")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_order_fill_rate: one order-key join, order-grade then month-grade aggregates") {
    val p = plan("q_order_fill_rate")
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"exactly the orders-lineitem join, found $joins:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("q_embed_norms: row-local norm fold, no embedding array in any exchange") {
    val p = plan("q_embed_norms")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("embedding#")),
      s"the embedding array must fold before any exchange:\n$p")
    assert(p.contains("partial_percentile"),
      s"the exact median must combine map-side:\n$p")
  }

  test("q_transition_entropy: one user window, vocab-grade entropy fold") {
    val p = plan("q_transition_entropy")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"one user-ordered window only, found $windows:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_revenue_bridge: month-grade lag window over one lineitem aggregate") {
    val p = plan("q_revenue_bridge")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_sum"),
      s"monthly decimal sums must combine map-side:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"lineitem must be scanned once, found $scans:\n$p")
  }

  test("q_cart_abandon: user-day equi-joins only, no range join") {
    val p = plan("q_cart_abandon")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the purchase-cover attach must be an equi-join:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("q_brand_hhi: broadcast dim, decimal squares combine map-side") {
    val p = plan("q_brand_hhi")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"lineitem must not shuffle for the dim attach:\n$p")
    assert(p.contains("partial_sum"),
      s"revenue sums must combine map-side:\n$p")
  }

  test("q_lexical_diversity: two stacked aggregates, text stays at the scan") {
    val p = plan("q_lexical_diversity")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
    assert(p.contains("partial_count"),
      s"token counts must combine map-side:\n$p")
  }

  test("q_purchase_path_len: both running counts share one user window; no self-join") {
    val p = plan("q_purchase_path_len")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    // Both running counts ride the SAME user exchange (Spark may split
    // them into separate Window nodes, but they must not re-shuffle);
    // the only other exchanges are histogram-grade.
    val userEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userEx == 1,
      s"running counts must share ONE user exchange, found $userEx:\n$p")
  }

  test("q_weekend_lift: two-bucket conditional agg over the daily table, no join") {
    val p = plan("q_weekend_lift")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_value_deciles: one percentile-array pass, no sort, no window") {
    val p = plan("q_value_deciles")
    assert(p.contains("partial_percentile"),
      s"the decile array must combine map-side:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Sort ") &&
      l.contains("o_totalprice")),
      s"no corpus sort belongs here:\n$p")
  }

  test("q_keyword_stuffing: bounded heap cut, text stays at the scan") {
    val p = plan("q_keyword_stuffing")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must plan as a bounded heap:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_returns_rate: one scan, one aggregate, conditional sums map-side") {
    val p = plan("q_returns_rate")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_sum"),
      s"conditional sums must combine map-side:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"lineitem must be scanned once, found $scans:\n$p")
  }

  test("q_hourly_profile: grid-bounded share window, one scan") {
    val p = plan("q_hourly_profile")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_supplier_share: two stacked part-keyed aggregates, no join") {
    val p = plan("q_supplier_share")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_sum"),
      s"revenue sums must combine map-side:\n$p")
  }

  test("q_cooccur_pmi: row-local pair explode, broadcast marginals, bounded heap") {
    val p = plan("q_cooccur_pmi")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-25 cut must plan as a bounded heap:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the df marginals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join belongs in the marginal attach:\n$p")
  }

  test("q_catalog_coverage: sold side aggregates before the left join") {
    val p = plan("q_catalog_coverage")
    assert(!p.contains("CartesianProduct"),
      s"the sold attach must be an equi-join:\n$p")
    assert(p.contains("partial_sum"),
      s"sold revenue must combine map-side:\n$p")
  }

  test("q_label_separation: labels-bounded pair join, arrays assembled row-locally") {
    val p = plan("q_label_separation")
    assert(!p.contains("CartesianProduct"),
      s"the label pair join must not be a cartesian:\n$p")
    // The only exchanges are (label, dim)- and label-grade.
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("embedding#")),
      s"the raw embedding array must never enter an exchange:\n$p")
  }

  test("q_cluster_spread: digest-keyed clusters, text stays at the scan") {
    val p = plan("q_cluster_spread")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_lifecycle_stages: one user aggregate, tier-bounded rollup, no join") {
    val p = plan("q_lifecycle_stages")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_peak_days: integer mean gate, broadcast totals, day-grade lags") {
    val p = plan("q_peak_days")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row totals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join belongs here:\n$p")
  }

  test("q_gram_df_hist: hashes-only shuffles, exact integer bucketing") {
    val p = plan("q_gram_df_hist")
    assert(!p.contains("log2") && !p.contains("LOG2"),
      s"bucketing must be exact integer bin-length, not float log:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_silhouette: centroids broadcast; distances fold row-locally") {
    val p = plan("q_silhouette")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the labels-bounded centroid table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"vectors must never shuffle against centroids:\n$p")
  }

  test("q_lorenz: histogram rank, decile-grade cumulative, broadcast totals") {
    val p = plan("q_lorenz")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row totals must broadcast:\n$p")
    // globalRank's per-value windows, not a customer-grade
    // SinglePartition rank.
    assert(p.contains("windowspecdefinition(__rk_v"),
      s"ranking must ride the histogram scheme:\n$p")
  }

  test("q_wow_growth: week-grade lags over one events aggregate") {
    val p = plan("q_wow_growth")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_interarrival: one type-partitioned window, decimal power sums") {
    val p = plan("q_interarrival")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows == 1, s"one type window only, found $windows:\n$p")
    assert(p.contains("partial_sum"),
      s"power sums must combine map-side:\n$p")
  }

  test("q_attribution_first: mirror of q_attribution — one carry-forward window, no join") {
    val p = plan("q_attribution_first")
    assert(!p.contains("Join"),
      s"first-touch must be one window, not an as-of join per channel:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2,
      s"expected user window + channel agg only, found $exchanges exchanges:\n$p")
  }

  test("q_dedup_threshold_curve: candidate pipeline unchanged — no window, integer bands") {
    val p = plan("q_dedup_threshold_curve")
    assert(!p.contains("Window"),
      s"the shingle family never uses a window:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_segment_affinity: broadcast dim, grid-bounded marginal windows") {
    val p = plan("q_segment_affinity")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"orders must not shuffle for the dim attach:\n$p")
  }

  test("q_source_lang_mix: one aggregate, one grid window, one scan") {
    val p = plan("q_source_lang_mix")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"documents must be scanned once, found $scans:\n$p")
  }

  test("q_share_of_parent: three broadcast dim hops, one fact aggregate") {
    val p = plan("q_share_of_parent")
    val bc = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bc == 3, s"expected 3 broadcast dim hops, found $bc:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the fact table must not shuffle for dims:\n$p")
  }

  test("q_dim_variance: quantized integer moments, no join, no array in exchanges") {
    val p = plan("q_dim_variance")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_sum"),
      s"per-dim moments must combine map-side:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("embedding#")),
      s"the embedding array must explode before any exchange:\n$p")
  }

  test("q_sample_bias: lang-bounded composition join, no cartesian") {
    val p = plan("q_sample_bias")
    assert(!p.contains("CartesianProduct"),
      s"the composition join must be an equi-join:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_lognormal_fit: quantized integer moments, one scan, no join") {
    val p = plan("q_lognormal_fit")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("PushedFilters: [") &&
      p.contains("GreaterThan(value,0"),
      s"the value>0 filter must push to parquet:\n$p")
  }

  test("q_tier_migration: median thresholds broadcast; matrix is bounded") {
    val p = plan("q_tier_migration")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row medians must broadcast:\n$p")
    assert(p.contains("partial_percentile"),
      s"the medians must combine map-side:\n$p")
  }

  test("q_growth_accounting: one user exchange; churn from the day-table lag") {
    val p = plan("q_growth_accounting")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val userEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userEx == 1,
      s"the per-user lag must ride ONE user exchange, found $userEx:\n$p")
  }

  test("q_brand_price_position: global mean from cached brand sums — one fact pass") {
    val p = plan("q_brand_price_position")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dim must broadcast:\n$p")
    val hits = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(hits >= 2,
      s"report and global mean must reuse the cached brand table, found $hits hits:\n$p")
  }

  test("q_forecast_compare: both predictors ride one type window; no join") {
    val p = plan("q_forecast_compare")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"events must be scanned once, found $scans:\n$p")
  }

  test("q_dup_quality: digest-keyed size attach, text folds at the scan") {
    val p = plan("q_dup_quality")
    assert(!p.contains("CartesianProduct"),
      s"the size attach must be an equi-join:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_segment_value_bands: broadcast dim, one percentile-array pass") {
    val p = plan("q_segment_value_bands")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer dim must broadcast:\n$p")
    assert(p.contains("partial_percentile"),
      s"the band percentiles must combine map-side:\n$p")
  }

  test("q_centroid_stability: labels-bounded half join, arrays row-local") {
    val p = plan("q_centroid_stability")
    assert(!p.contains("CartesianProduct"),
      s"the half join must be an equi-join:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("embedding#")),
      s"the raw embedding array must never enter an exchange:\n$p")
  }

  test("q_vocab_coverage: vocab-sized rank window, broadcast totals") {
    val p = plan("q_vocab_coverage")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row totals must broadcast:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_psi: pushed purchase filter, bin-bounded fold, broadcast totals") {
    val p = plan("q_psi")
    assert(p.contains("PushedFilters: [") &&
      p.contains("EqualTo(event_type,purchase"),
      s"purchase filter must push to parquet:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the single-row totals must broadcast:\n$p")
  }

  test("q_rare_token_share: token-keyed df combines map-side; bounded heap cut") {
    val p = plan("q_rare_token_share")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must plan as a bounded heap:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_bot_suspects: two stacked aggregates, bounded heap, no join") {
    val p = plan("q_bot_suspects")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must plan as a bounded heap:\n$p")
  }

  test("q_nation_balance: both fact sides aggregate before the 25-row grid joins") {
    val p = plan("q_nation_balance")
    assert(!p.contains("CartesianProduct"),
      s"the grid joins must be equi-joins:\n$p")
    val bc = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bc >= 2, s"dim hops must broadcast, found $bc:\n$p")
  }

  test("q_priority_drift: grid-bounded shares and lags, one orders scan") {
    val p = plan("q_priority_drift")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"orders must be scanned once, found $scans:\n$p")
  }

  test("q_token_len_hist: lengths fold scan-side, bounded histogram windows") {
    val p = plan("q_token_len_hist")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && (l.contains("text#") || l.contains("tok#"))),
      s"neither text nor tokens may enter an exchange — only length keys:\n$p")
  }

  test("q_session_count_dist: session flags on one user window, two cheap aggregates") {
    val p = plan("q_session_count_dist")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val userEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(userEx == 1,
      s"window and per-user agg must share ONE user exchange, found $userEx:\n$p")
  }

  test("q_gap_hazard: pushed purchase filter, bounded reverse cumulative") {
    val p = plan("q_gap_hazard")
    assert(p.contains("PushedFilters: [") &&
      p.contains("EqualTo(event_type,purchase"),
      s"purchase filter must push to parquet:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
  }

  test("q_quality_vs_length: one scan, bounded bin aggregate, quality folds scan-side") {
    val p = plan("q_quality_vs_length")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"documents must be scanned once, found $scans:\n$p")
  }

  test("q_discount_priority_matrix: one order-key join, bounded-grid aggregate") {
    val p = plan("q_discount_priority_matrix")
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"exactly the lineitem-orders join, found $joins:\n$p")
    assert(p.contains("partial_sum"),
      s"cell sums must combine map-side:\n$p")
  }

  test("q_order_seasonality: 12-row grid, one scan, no join") {
    val p = plan("q_order_seasonality")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"orders must be scanned once, found $scans:\n$p")
  }

  test("q_top_suppliers: fact aggregates BEFORE the broadcast dim; bounded heap") {
    val p = plan("q_top_suppliers")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-20 cut must plan as a bounded heap:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the supplier dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"lineitem must not shuffle for the dim attach:\n$p")
  }

  test("q_dup_degree_dist: one pair join (the candidate self-join), degrees from the union") {
    val p = plan("q_dup_degree_dist")
    assert(!p.contains("Window"),
      s"the shingle family never uses a window:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_decile_type_mix: histogram rank, user-keyed mix join") {
    val p = plan("q_decile_type_mix")
    assert(p.contains("windowspecdefinition(__rk_v"),
      s"ranking must ride the globalRank histogram scheme:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the decile attach must be an equi-join:\n$p")
  }

  test("q_size_price_corr: single-pass integer moments on the dim table") {
    val p = plan("q_size_price_corr")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    assert(p.contains("partial_count"),
      s"moments must combine map-side:\n$p")
  }

  test("q_charclass_profile: class counts fold scan-side, one aggregate") {
    val p = plan("q_charclass_profile")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_balance_activity_corr: counts fold before the customer join; single closing row") {
    val p = plan("q_balance_activity_corr")
    assert(!p.contains("CartesianProduct"),
      s"the activity attach must be an equi-join:\n$p")
    assert(p.contains("partial_count"),
      s"order counts must combine map-side:\n$p")
  }

  test("q_keeper_bias: digest-keyed survivor attach, text stays at the scan") {
    val p = plan("q_keeper_bias")
    assert(!p.contains("CartesianProduct"),
      s"the survivor attach must be an equi-join:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_doc_len_gini: histogram rank, single closing row, no corpus sort") {
    val p = plan("q_doc_len_gini")
    assert(p.contains("windowspecdefinition(__rk_v"),
      s"ranking must ride the globalRank histogram scheme:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_segment_basket: per-order aggregate BEFORE the dim joins") {
    val p = plan("q_segment_basket")
    assert(!p.contains("CartesianProduct"),
      s"the dim attaches must be equi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer dim must broadcast:\n$p")
  }

  test("q_type_revenue_topk: fact aggregates first, broadcast dim, bounded heap") {
    val p = plan("q_type_revenue_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-10 cut must plan as a bounded heap:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the part dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the aggregated fact side must not shuffle for the dim:\n$p")
  }

  test("q_segment_loyalty: counts fold before the broadcast dim") {
    val p = plan("q_segment_loyalty")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the aggregated counts must not shuffle for the dim:\n$p")
  }

  test("q_lang_dup_rate: hashes-only shuffles through the df pipeline") {
    val p = plan("q_lang_dup_rate")
    assert(!p.contains("Window"),
      s"the shingle family never uses a window:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"raw text must never enter an exchange:\n$p")
  }

  test("q_user_ltv_bands: user-keyed decimal sums, one percentile-array pass") {
    val p = plan("q_user_ltv_bands")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(p.contains("partial_percentile"),
      s"the band percentiles must combine map-side:\n$p")
    assert(p.contains("PushedFilters: [") &&
      p.contains("EqualTo(event_type,purchase"),
      s"purchase filter must push to parquet:\n$p")
  }

  test("q_conversion_lag: first-view window and first-purchase agg share the user exchange") {
    val p = plan("q_conversion_lag")
    assert(!p.contains("Join"), s"single-pass form must not join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"window + groupBy must share ONE user_id exchange, found $exchanges:\n$p")
    // The admission filter reaches the scan.
    assert(p.contains("PushedFilters: [") && p.contains("In(event_type"),
      s"event_type filter must push to parquet:\n$p")
  }

  test("q_corpus_funnel: two corpus scans, one funnel aggregation, no per-stage re-reads") {
    val p = plan("q_corpus_funnel")
    // Pass 1 (keeper digests) + pass 2 (flagged fold) — the naive
    // union-of-four-aggregates form reads documents five times.
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(scans == 2, s"expected exactly 2 documents scans, got $scans:\n$p")
    // All four funnel rows come out of ONE aggregation + a row-local
    // reshape: a single pair of final/partial HashAggregates past the
    // keeper join, and no Union of aggregates.
    assert(!p.contains("Union"), s"per-stage union re-appeared:\n$p")
    assert(p.contains("Generate explode"),
      s"funnel reshape must be the row-local explode:\n$p")
    // The dedup exchange moves digests, never text: no Exchange row
    // may carry the text column.
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange") && l.contains("text#")),
      s"document text entered an exchange:\n$p")
  }
}
