package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distributed byte-pair-encoding TOKENIZER TRAINING — the missing
  * half of the token-counting story (TextAnalysis counts with a fixed
  * BPE-ish regex; training data pipelines also need to LEARN the
  * vocabulary from the corpus — Sennrich et al. 2016, the public BPE
  * algorithm every mainstream LLM tokenizer descends from).
  *
  * The 100 TB shape is the distinct-word collapse: pair statistics
  * depend only on (distinct word, frequency), so ONE corpus-sized
  * aggregation reduces terabytes of text to a vocabulary table of at
  * most a few million rows, and every training iteration then runs on
  * that compact, cached table — an adjacent-pair count (map-side
  * combined, 32 partitions) plus a 1-row argmax collect per merge.
  * Iteration count is the vocabulary budget (tens of thousands in
  * production); per-iteration cost never touches the corpus again.
  * (A production trainer would delta-update pair counts between
  * merges — the Sennrich optimization; the recount here keeps each
  * iteration stateless and partitioning-independent, and the table it
  * recounts is vocabulary-sized, not corpus-sized.)
  *
  * Merge application is a pure catalyst fold (`aggregate` over the
  * symbol array — left-greedy, non-overlapping, exactly the reference
  * semantics), so the hot path stays inside whole-stage codegen: no
  * UDFs anywhere.
  *
  * Determinism: pair counts are exact Long sums; the argmax
  * tie-breaks lexicographically on (left, right) — the result is
  * bit-identical under any partitioning, which BpeSpec pins against a
  * single-threaded reference implementation. */
object Bpe {

  /** Lowercased whitespace words with occurrence counts — the corpus
    * → vocabulary collapse (the ONLY corpus-sized pass). */
  def wordWeights(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** One left-greedy application of merge (l, r) over a symbol-array
    * column: fold the array, emitting `l+r` wherever `l` is
    * immediately followed by `r` (non-overlapping, leftmost-first —
    * reference BPE semantics). Pure built-in HOFs. The pair arrives
    * as COLUMNS (not literals) so every iteration produces the
    * identical generated source and the janino compile — which
    * otherwise dominates per-merge cost — is paid exactly once
    * (whole-stage codegen caches on source text). */
  private def applyMerge(syms: org.apache.spark.sql.Column,
                         l: org.apache.spark.sql.Column,
                         r: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    val step = (acc: org.apache.spark.sql.Column,
                x: org.apache.spark.sql.Column) =>
      when(acc.getField("prev").isNull,
          struct(acc.getField("out").as("out"), x.as("prev")))
        .when(acc.getField("prev") === l && x === r,
          struct(concat(acc.getField("out"), array(concat(l, r))).as("out"),
            lit(null).cast("string").as("prev")))
        .otherwise(
          struct(concat(acc.getField("out"),
              array(acc.getField("prev"))).as("out"), x.as("prev")))
    val fin = (acc: org.apache.spark.sql.Column) =>
      when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev"))))
    fin(aggregate(syms, init, step))
  }

  /** Train `numMerges` BPE merges over the corpus. Returns the merge
    * rules in rank order. `maxWordChars` is the production scale
    * guard every real trainer carries: the per-word fold is
    * O(length²) per merge, so one pathological megabyte-long
    * "word" (minified code, base64 blobs — no whitespace) would
    * dominate the whole iteration; longer words are excluded from
    * TRAINING (statistics loss is negligible — they are by
    * definition near-unique) while encoding still handles any
    * length. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWordChars: Int = 512): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    require(maxWordChars >= 2, s"maxWordChars must be >= 2: $maxWordChars")
    val spark = docs.sparkSession
    // localCheckpoint (not cache) at EVERY step: each merge nests
    // another fold expression, and 20+ levels of generated aggregate
    // code in one plan blow past codegen limits and driver heap —
    // checkpointing materializes the vocabulary AND truncates the
    // plan, keeping every iteration's tree one fold deep.
    var vocab = wordWeights(docs, textCol)
      .filter(length(col("w")) <= maxWordChars)
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .repartition(32)
      .localCheckpoint()
    // Size iteration parallelism to the VOCABULARY, not the corpus:
    // per-merge jobs run dozens of times, so task-launch overhead on
    // a near-empty 32-way table would dominate training. ~50k words
    // per partition; narrow coalesce, lineage stays checkpointed.
    val nWords = vocab.count()
    val parts = math.max(1L, math.min(32L, nWords / 50000L + 1)).toInt
    if (parts < 32) vocab = vocab.coalesce(parts)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      // Adjacent pairs weighted by word frequency; exact Long counts;
      // deterministic lexicographic tie-break.
      // Guard single-symbol words: sequence(0, -1) would COUNT DOWN
      // (step inference), so pairs exist only where size >= 2; the
      // null arm explodes to zero rows.
      val best = vocab
        .select(explode(when(size(col("syms")) >= 2, expr(
          "transform(sequence(0, size(syms) - 2), " +
            "j -> struct(syms[j] AS l, syms[j + 1] AS r))"))).as("p"),
          col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true // every word fully merged
      else {
        val l = best.head.getString(0); val r = best.head.getString(1)
        merges += l -> r
        // The pair rides a broadcast 1-row join (NOT literals): the
        // plan — and its generated code — is identical every
        // iteration, so codegen compiles once for the whole run.
        val pair = spark.createDataFrame(
          java.util.Collections.singletonList(
            org.apache.spark.sql.Row(l, r)),
          StructType(Seq(StructField("__l", StringType, nullable = false),
            StructField("__r", StringType, nullable = false))))
        val next = vocab.crossJoin(broadcast(pair))
          .select(applyMerge(col("syms"), col("__l"), col("__r")).as("syms"),
            col("cnt"))
          .localCheckpoint() // eager: materializes + truncates lineage
        vocab.unpersist()
        vocab = next
        i += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** Tokenize one word with trained merges, rank order — the
    * driver-side reference encoder (specs + spot checks; bulk corpus
    * tokenization would apply the same folds column-wise). */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString)
    merges.foreach { case (l, r) =>
      val out = Seq.newBuilder[String]
      var prev: String = null
      syms.foreach { x =>
        if (prev == null) prev = x
        else if (prev == l && x == r) { out += (l + r); prev = null }
        else { out += prev; prev = x }
      }
      if (prev != null) out += prev
      syms = out.result().toIndexedSeq
    }
    syms
  }
}
