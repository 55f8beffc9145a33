package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bm25Index
import graft.sources.SnapshotTable

/** The materialized BM25 index: incremental build == one-shot build,
  * query pruning opens only the matching terms' posting files, and
  * results are partitioning-independent (decimal score sums). */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-bm25-$tag").toString + "/ix"

  private val docs = Seq(
    (0L, "spark join merge table"),
    (1L, "spark spark spark window"),
    (2L, "merge sort filter row column"),
    (3L, "window window vector vector vector"),
    (4L, "the a of and or but"),
    (5L, "spark merge window vector"),
    (6L, "table scan batch stream"),
    (7L, "vector vector spark"))

  private def results(dir: String, terms: Seq[String], k: Int) =
    Bm25Index.search(spark, dir, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("legacy stats layouts are refused with a rebuild hint, never summed raw") {
    // pre-r9 signature 1: a doclen/ sub-table next to postings/stats
    val legacy1 = tmp("legacy1")
    Bm25Index.append(docs.toDF("doc_id", "text"), legacy1)
    SnapshotTable.append(Seq((0L, 4L)).toDF("doc_id", "dl"),
      s"$legacy1/doclen")
    val e1 = intercept[IllegalStateException] {
      Bm25Index.search(spark, legacy1, Seq("spark"), 3) }
    assert(e1.getMessage.contains("rebuild"))
    intercept[IllegalStateException] {
      Bm25Index.append(docs.toDF("doc_id", "text"), legacy1) }
    // pre-r9 signature 2: a stats table whose schema is not (n, tottok)
    val legacy2 = tmp("legacy2")
    SnapshotTable.append(Seq((0L, 4L)).toDF("doc_id", "dl"),
      s"$legacy2/stats")
    val e2 = intercept[IllegalStateException] {
      Bm25Index.append(docs.toDF("doc_id", "text"), legacy2) }
    assert(e2.getMessage.contains("rebuild"))
  }

  test("incremental build equals one-shot build, any input partitioning") {
    val oneShot = tmp("one"); val inc = tmp("inc")
    val df = docs.toDF("doc_id", "text")
    Bm25Index.append(df, oneShot)
    Bm25Index.append(df.filter($"doc_id" < 4L).repartition(5), inc)
    Bm25Index.append(df.filter($"doc_id" >= 4L).repartition(3), inc)
    val terms = Seq("spark", "vector")
    val a = results(oneShot, terms, 8)
    val b = results(inc, terms, 8)
    assert(a == b, s"\none-shot: $a\nincremental: $b")
    // the top doc for {spark, vector} mentions both heavily
    assert(a.head._1 == 5L || a.head._1 == 7L)
    // every result doc actually contains a query term
    val expectDocs = docs.filter(d => terms.exists(d._2.split(" ").contains))
      .map(_._1).toSet
    assert(a.map(_._1).toSet == expectDocs)
  }

  test("query pruning opens only the matching terms' posting files") {
    val dir = tmp("prune")
    Bm25Index.append(docs.toDF("doc_id", "text"), dir, shards = 4)
    val (sel, tot) = SnapshotTable.pruneFilesEq(
      spark, s"$dir/postings", "term", "vector")
    assert(tot >= 3, s"expected multiple posting shards, got $tot")
    assert(sel.length < tot,
      s"term probe must prune posting files ($sel of $tot)")
    // a term that doesn't exist opens nothing (bloom + stats agree)
    val (none, _) = SnapshotTable.pruneFilesEq(
      spark, s"$dir/postings", "term", "zzzznotaterm")
    assert(none.isEmpty)
  }

  test("exactly-once indexing: replayed batches are index no-ops, stream == batch") {
    val batchIx = tmp("b"); val streamIx = tmp("s")
    val df = docs.toDF("doc_id", "text")
    Bm25Index.append(df, batchIx)
    // a streaming run over the same docs in two micro-batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("graft-bm25-ckpt").toString
    val q = Bm25Index.startIndexing(
      in.toDF().toDF("doc_id", "text"), streamIx, "bm25-spec", ckpt)
    try {
      in.addData(docs.take(4): _*); q.processAllAvailable()
      in.addData(docs.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    val terms = Seq("spark", "vector", "merge")
    assert(results(streamIx, terms, 8) == results(batchIx, terms, 8))
    // REPLAY both micro-batches by hand: every surface unchanged
    val before = (
      SnapshotTable.latestVersion(spark, s"$streamIx/postings"),
      SnapshotTable.latestVersion(spark, s"$streamIx/stats"),
      results(streamIx, terms, 8))
    Bm25Index.appendTxn(df.filter($"doc_id" < 4L), streamIx, "bm25-spec", 0L)
    Bm25Index.appendTxn(df.filter($"doc_id" >= 4L), streamIx, "bm25-spec", 1L)
    assert((SnapshotTable.latestVersion(spark, s"$streamIx/postings"),
      SnapshotTable.latestVersion(spark, s"$streamIx/stats"),
      results(streamIx, terms, 8)) == before)
  }

  test("corpus scalars fold from per-batch delta rows") {
    val dir = tmp("stats")
    Bm25Index.append(docs.take(4).toDF("doc_id", "text"), dir)
    Bm25Index.append(docs.drop(4).toDF("doc_id", "text"), dir)
    // one tiny delta row per batch; the fold is the corpus truth —
    // no per-document doclen table, no materialized view
    val deltas = SnapshotTable.read(spark, s"$dir/stats").collect()
    assert(deltas.length == 2)
    val totalToks = docs.map(_._2.split(" ", -1).length.toLong).sum
    assert(deltas.map(_.getAs[Long]("n")).sum == 8L)
    assert(deltas.map(_.getAs[Long]("tottok")).sum == totalToks)
  }
}
