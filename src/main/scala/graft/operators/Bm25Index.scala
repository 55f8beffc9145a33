package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable
import graft.functions.TextAnalysis

/** A MATERIALIZED inverted index for BM25 retrieval, built entirely
  * from this repo's own table format — the production counterpart of
  * the full-scan `q_bm25` scorer (tokenization and scoring formula
  * identical, so the index is differentially checkable against it):
  *
  *   - `<dir>/postings` — one SnapshotTable of (term, doc_id, tf, dl)
  *     rows, DENORMALIZED with the document length so a query never
  *     joins back to a per-document table. Each build/append batch is
  *     range-partitioned by term and term-sorted, and the table
  *     tracks per-file term min/max stats AND term Bloom bitsets —
  *     a k-term query opens only the posting files that might hold
  *     its terms ([[SnapshotTable.readWhereEqAny]]), never the index.
  *   - `<dir>/stats` — one tiny DELTA row per indexed batch
  *     (`n` = documents, `tottok` = tokens), folded by a sum at query
  *     time: corpus scalars cost one control-plane read of a
  *     rows-per-batch table, not a corpus scan. (An earlier layout
  *     kept a per-document doclen table feeding a materialized view —
  *     dead weight: dl is denormalized into the postings, so the
  *     per-doc rows were never queried and doubled the write cost.)
  *
  * Document frequency is NOT materialized: df(term) = the row count
  * of the term's postings, already in hand after pruning — exact at
  * every index size, and immune to the incremental-df staleness
  * every materialized-idf design fights. Incremental ingest =
  * [[append]] (new posting files + one scalar-delta row);
  * doc_ids must be new (re-adding a document is the caller's dedup
  * problem, same as every public search engine's upsert story).
  *
  * 100 TB shape: a query touches k Bloom probes + O(matching posting
  * files) + a one-row scalar read; the corpus itself is never
  * scanned. */
object Bm25Index {
  private def postingsDir(dir: String) = s"$dir/postings"
  private def statsDir(dir: String) = s"$dir/stats"

  /** LAYOUT GUARD: the stats table changed from a per-document doclen
    * matview (pre-r9: a `doclen/` sub-table + refreshed aggregates) to
    * ONE (n, tottok) scalar-delta row per indexed batch. Appending to
    * or folding an old-layout index would silently sum rows of the
    * wrong grain — detect either signature and fail with a rebuild
    * hint before any write or fold happens. */
  private def checkLayout(spark: SparkSession, dir: String): Unit = {
    val rebuild = s"rebuild the index (re-append all batches into a " +
      s"fresh directory) — $dir was built under the pre-scalar-delta " +
      "stats layout"
    val dl = new org.apache.hadoop.fs.Path(s"$dir/doclen")
    if (dl.getFileSystem(spark.sessionState.newHadoopConf()).exists(dl))
      throw new IllegalStateException(
        s"Bm25Index: found legacy doclen sub-table — $rebuild")
    SnapshotTable.latestVersion(spark, statsDir(dir)).foreach { v =>
      val cols = SnapshotTable.read(spark, statsDir(dir), Some(v))
        .schema.fieldNames.toSet
      if (cols != Set("n", "tottok")) throw new IllegalStateException(
        s"Bm25Index: stats table has columns ${cols.mkString(", ")} " +
          s"instead of (n, tottok) — $rebuild")
    }
  }

  /** (term, doc_id, tf, dl) for a doc batch — `q_bm25`'s tokenization
    * verbatim: split on single space, EMPTY tokens kept (they are
    * tokens in the exploded form too). */
  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("dl"))
    tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
  }

  /** Build the index (first call) or extend it with a new doc batch
    * (later calls): postings land term-range-partitioned and
    * term-sorted so per-file term stats are disjoint and pruning is
    * sharp; each batch also lands its one-row corpus-scalar delta.
    * `shards` bounds the files per batch. */
  def append(docs: DataFrame, dir: String, idCol: String = "doc_id",
             textCol: String = "text", shards: Int = 8): Unit =
    appendImpl(docs, dir, idCol, textCol, shards, txn = None)

  /** The one indexing body behind [[append]] and [[appendTxn]] — the
    * two index forms must never diverge (tokenization, layout, and
    * the scalar-delta layout are all load-bearing for the q_bm25
    * differential check), so only the COMMIT discipline varies. */
  private def appendImpl(docs: DataFrame, dir: String, idCol: String,
                         textCol: String, shards: Int,
                         txn: Option[(String, Long)]): Unit = {
    checkLayout(docs.sparkSession, dir)
    // PERSIST the postings once: three consumers follow — the range
    // partitioner's SAMPLING pass, the postings write itself, and the
    // scalar-delta aggregate — and uncached each would re-run the
    // whole tokenize + tf/dl pipeline. The delta aggregates the
    // PRE-repartition frame (bit-identical values — aggregation is
    // partitioning-free) so its lineage skips the range sample too.
    val p0 = postingsOf(docs, idCol, textCol).persist()
    try {
      val posts = p0
        .repartitionByRange(shards, col("term"))
        .sortWithinPartitions("term", "doc_id")
      // The batch's corpus-scalar DELTA (doc_ids are new by contract,
      // so the batch's distinct docs are globally new): one tiny row
      // per batch, summed at query time.
      val delta = p0.agg(
        countDistinct(col("doc_id")).cast("long").as("n"),
        coalesce(sum(col("tf")), lit(0L)).cast("long").as("tottok"))
      txn match {
        case Some((appId, tv)) =>
          SnapshotTable.transactionalAppend(posts, postingsDir(dir), appId,
            tv, statsCols = Seq("term"), bloomCols = Seq("term"))
          // same (appId, txnVersion): a crash between the two commits
          // converges on retry, each table exactly-once
          SnapshotTable.transactionalAppend(delta, statsDir(dir), appId, tv)
        case None =>
          SnapshotTable.append(posts, postingsDir(dir),
            statsCols = Seq("term"), bloomCols = Seq("term"))
          SnapshotTable.append(delta, statsDir(dir))
      }
    } finally { p0.unpersist(false); () }
    // Delta rows accrete one file per batch: without folding, a
    // streaming index at trigger cadence would make every search()
    // pay an O(#batches) scalar fold. Bin-pack the tiny files once
    // enough accumulate — a plain (non-ledgered) compaction commit,
    // harmless under replay; search stays a bounded control-plane
    // read at any ingest history.
    val spark = docs.sparkSession
    SnapshotTable.latestVersion(spark, statsDir(dir)).foreach { v =>
      if (SnapshotTable.manifestFiles(spark, statsDir(dir), v).size > 32)
        SnapshotTable.binPackSmall(spark, statsDir(dir),
          smallerThanBytes = 4L << 20)
    }
  }

  /** EXACTLY-ONCE [[append]] for replayable writers (the streaming
    * contract): postings and stats each land under their own
    * per-`appId` transaction ledger with `txnVersion` as the batch
    * version, so a replayed micro-batch is a manifest no-op on
    * whichever sub-table already holds it — a crash BETWEEN the two
    * commits converges on retry (each table exactly-once). Queries
    * stay correct throughout: df is computed exact from the postings
    * actually read, and the scalar table is ledgered with the same
    * (appId, txnVersion) — a momentarily-behind N is ordinary
    * async-stats lag, never wrong postings. */
  def appendTxn(docs: DataFrame, dir: String, appId: String,
                txnVersion: Long, idCol: String = "doc_id",
                textCol: String = "text", shards: Int = 8): Unit =
    appendImpl(docs, dir, idCol, textCol, shards,
      txn = Some(appId -> txnVersion))

  /** Streaming search-index maintenance: each micro-batch of
    * documents tokenizes, scores and lands through [[appendTxn]]'s
    * ledger discipline (txnVersion = batchId) — checkpoint-recovery
    * replays are index no-ops, so the index holds each document's
    * postings exactly once with no downstream dedup. */
  def startIndexing(docs: DataFrame, dir: String, appId: String,
                    checkpointPath: String
                   ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendTxn(batch, dir, appId, batchId)
        ()
      }
      .start()

  /** Top-`k` documents for `terms` by summed BM25 (k1=1.2, b=0.75 —
    * `q_bm25`'s exact per-(doc, term) expression incl. its 6-dp
    * rounding; the rounded per-term scores are then EXACT
    * DECIMAL(18,6) values, summed in the decimal ring so the total is
    * aggregation-order-free — a double sum here would make top-k
    * boundaries partitioning-dependent). Touches ONLY the pruned
    * posting files and the per-batch scalar fold; df comes exact from
    * the pruned rows themselves. */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             k: Int): DataFrame = {
    require(terms.nonEmpty, "Bm25Index.search: at least one term")
    require(k > 0, s"Bm25Index.search: k must be positive, got $k")
    checkLayout(spark, dir)
    val posts = SnapshotTable.readWhereEqAny(
      spark, postingsDir(dir), "term", terms.distinct)
    // control-plane fold of the per-batch scalar deltas (one tiny
    // row per indexed batch)
    val sRow = SnapshotTable.read(spark, statsDir(dir))
      .agg(sum("n").cast("long").as("n"),
        sum("tottok").cast("long").as("tottok")).collect().head
    val n = sRow.getAs[Long]("n")
    val tottok = sRow.getAs[Long]("tottok")
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val perTerm = TextAnalysis.roundStable(
      idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl") / (lit(tottok) / lit(n)))),
      6)
    posts.join(broadcast(dfreq), "term")
      .withColumn("s", perTerm)
      .groupBy("doc_id")
      .agg(sum(col("s").cast("decimal(18,6)"))
        .cast("double").as("score")) // exact 6-dp decimal → double
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
