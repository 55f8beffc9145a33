package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share
  * word n-grams with an evaluation corpus — the pre-training hygiene
  * step every LLM data pipeline runs (the GPT-3/Llama "13-gram
  * overlap" rule, parameterized here) so that eval sets don't leak
  * into the training corpus and inflate downstream scores.
  *
  * Unlike the near-dup family (symmetric, corpus×corpus), this is an
  * ASYMMETRIC containment probe: the eval side is a benchmark suite —
  * thousands of documents, not billions — so its deduplicated shingle
  * set is broadcast, and the TRAIN side is entirely map-side up to
  * the join: gram hashes materialize scan-side (the native
  * [[graft.plans.WordGramHashes]] expression — no tokenize window, no
  * pre-join shuffle) and probe the broadcast table in place. The only
  * shuffle in the plan carries the MATCHED rows (contaminated grams —
  * vanishingly few by definition) into the per-doc aggregate, so the
  * probe scales linearly with corpus size at any executor count. (If
  * the eval side ever outgrows broadcast range, drop the hint and the
  * same plan degrades gracefully to a shuffle equi-join on the gram
  * hash.)
  *
  * Grams ride as 64-bit hashes (the same 8-bytes-instead-of-strings
  * trade the near-dup pipeline documents); a collision can only ADD a
  * false hit, never hide one.
  */
object Decontaminate {

  /** Per-train-doc contamination report: (doc_id, n_hits = distinct
    * contaminated w-grams, n_test_docs = distinct eval docs matched).
    * Clean documents produce no row — the caller anti-joins or
    * left-joins depending on whether it wants to drop or annotate.
    * Train-side gram multiplicity is NOT pre-deduplicated (that would
    * cost a corpus-wide shuffle); the countDistinct aggregates dedup
    * after the match, where only contaminated rows remain.
    *
    * `train` / `test` need (doc_id, text); shingling follows
    * [[Dedup.shingleRows]] (lowercased, whitespace tokens).
    *
    * `broadcastEval` (default true) force-broadcasts the eval shingle
    * set — correct for a benchmark suite (thousands of docs). The
    * hint BYPASSES autoBroadcastJoinThreshold, so a caller probing
    * against a large eval corpus must pass false to fall back to the
    * shuffle equi-join instead of collecting gigabytes to the
    * driver. */
  def ngramHits(train: DataFrame, test: DataFrame, w: Int = 8,
                broadcastEval: Boolean = true): DataFrame = {
    // Eval-side per-doc dedup is fused into the hasher (distinct
    // arrays explode to distinct (test_doc, s) by construction) — no
    // dropDuplicates exchange before the broadcast.
    val trainSh = Dedup.hashedShingleRows(train, w)
    val testSh = Dedup.hashedShingleRowsDistinct(test, w)
      .withColumnRenamed("doc_id", "test_doc")
    trainSh.join(if (broadcastEval) broadcast(testSh) else testSh, "s")
      .groupBy("doc_id")
      .agg(countDistinct("s").as("n_hits"),
        countDistinct("test_doc").as("n_test_docs"))
  }

  /** Driver-side collection of the eval corpus' distinct gram hashes,
    * ascending-sorted — bounded by the same eval-side contract that
    * licenses [[ngramHits]]' broadcast (a benchmark suite is thousands
    * of docs, so its gram set is driver-safe by construction). Collect
    * ONCE, then stamp any number of batches or micro-batches with
    * [[contaminationFlag]]. */
  def collectEvalGrams(test: DataFrame, w: Int = 8): Array[Long] = {
    val grams = Dedup.hashedShingleRowsDistinct(test, w)
      .select("s").distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(grams)
    grams
  }

  /** Map-only contamination flag — the STREAMING-safe form of
    * [[ngramHits]]: TRUE iff the text shares any w-gram with the
    * collected eval gram set. Stateless: no join, no aggregation, no
    * watermark — usable directly in an append-mode streaming ingest
    * (EventStreamsSpec pins stream ≡ batch). The probe is the native
    * [[graft.plans.SortedLongsContainAny]] expression: O(g · log |E|)
    * per row by binary search against the referenced sorted set, not
    * arrays_overlap's O(|E|)-per-row iteration. Same hash-collision
    * one-sidedness as ngramHits — a collision can only ADD a flag,
    * never hide one. */
  def contaminationFlag(textCol: org.apache.spark.sql.Column,
                        evalGrams: Array[Long], w: Int = 8): org.apache.spark.sql.Column =
    graft.plans.GraftFunctions.sortedLongsContainAny(
      graft.plans.GraftFunctions.wordGramHashesDistinct(lower(textCol), w),
      evalGrams)

  /** Bloom filter over the eval gram set — the COMPACT broadcast form
    * for when the eval suite outgrows the raw sorted-set ship:
    * `bitsPerKey` bits per gram (default 12 ⇒ ~0.5% false positives
    * with 4 hashes) instead of the sorted set's 64, a 5–6x smaller
    * per-task footprint. One-sided: a bloom hit may be spurious, a
    * miss is definitive — so use it as the PREFILTER of a two-phase
    * decontamination (see [[bloomCandidateFlag]]) whose exact refine
    * touches only the flagged sliver. */
  def bloomBits(evalGrams: Array[Long], bitsPerKey: Int = 12,
                numHashes: Int = 4): graft.plans.Bloom =
    graft.plans.Bloom(
      graft.plans.ExprHelpers.bloomBuild(evalGrams, bitsPerKey, numHashes),
      numHashes)

  /** Map-only Bloom PREFILTER flag: TRUE iff any w-gram of the text
    * hits the filter — a superset of the exact contamination set (no
    * false negatives; the [[graft.plans.Bloom]] carrier keeps the
    * probe's hash count pinned to the build's). Same stateless
    * streaming-safe shape as [[contaminationFlag]]; follow with an
    * exact refine (gram equi-join or sorted-set probe) over the
    * flagged rows only. */
  def bloomCandidateFlag(textCol: org.apache.spark.sql.Column,
                         bloom: graft.plans.Bloom,
                         w: Int = 8): org.apache.spark.sql.Column =
    graft.plans.GraftFunctions.bloomLongsContainAny(
      graft.plans.GraftFunctions.wordGramHashesDistinct(lower(textCol), w),
      bloom)
}
