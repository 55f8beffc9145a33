package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Dedup, Packing}

/** Training-pipeline corpus operators added in round 4: benchmark
  * decontamination, sequence packing, and the SemDeDup keep-set
  * composition. The oracle-checked query variants live in Queries;
  * these tests pin operator-level semantics the oracles can't
  * (broadcast shape, straddling bins, planted contamination). */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("decontaminate: planted eval overlap is found, clean docs are not flagged") {
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      // doc 1 embeds a full 6-gram of the eval doc (contaminated)
      (1L, s"noise one two $evalDoc tail words here"),
      // doc 2 shares only a 3-gram (below w) — clean
      (2L, "alpha beta gamma completely different text follows now ok"),
      // doc 3 disjoint — clean
      (3L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val test = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val rows = Decontaminate.ngramHits(train, test, w = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == Set(1L), s"only doc 1 is contaminated: ${rows.toSeq}")
    // eval doc has 8 tokens -> 3 distinct 6-grams; doc 1 contains them all
    assert(rows.head._2 == 3, "all three eval 6-grams must be counted")
    assert(rows.head._3 == 1)
  }

  test("decontaminate: eval side is broadcast (training corpus never shuffles for the probe)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val test = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val plan = Decontaminate.ngramHits(train, test, w = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval shingles must broadcast:\n$plan")
  }

  test("contiguousPack: bins fill in order, offsets wrap at the budget, straddle allowed") {
    val docs = Seq(
      (1L, "en", 300), (2L, "en", 300), (3L, "en", 100), (4L, "fr", 600))
      .map { case (id, l, n) => (id, l, ("w " * n).trim) }
      .toDF("doc_id", "lang", "text")
    val packed = Packing.contiguousPack(docs, budget = 512)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // en: doc1 starts at 0 (bin 0), doc2 starts at 300 (bin 0, straddles
    // into bin 1), doc3 starts at 600 (bin 1, offset 88)
    assert(packed(0) == (1L, "en", 300L, 300L, 0L, 0L))
    assert(packed(1) == (2L, "en", 300L, 600L, 0L, 300L))
    assert(packed(2) == (3L, "en", 100L, 700L, 1L, 88L))
    // fr shard numbers its own bins from 0
    assert(packed(3) == (4L, "fr", 600L, 600L, 0L, 0L))
  }

  test("contiguousPack: prefix sums are per-shard and budget is validated") {
    intercept[IllegalArgumentException] {
      Packing.contiguousPack(Seq((1L, "en", "a")).toDF("doc_id", "lang", "text"),
        budget = 0)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = Packing.contiguousPack(docs, budget = 512)
    // per-shard max cum_tokens equals the shard token total — the
    // prefix sum never leaks across shards
    val fromPack = packed.groupBy("lang").agg(max("cum_tokens").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = docs.groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromPack == direct)
  }

  test("corpus pipeline composes end-to-end: filter → decontaminate → dedup → pack") {
    // The full pretraining-prep chain as ONE composed job over the
    // corpus — what a user of the library actually runs. Each stage
    // consumes the previous stage's DataFrame; nothing is collected
    // until the final assertion.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // 1. Quality gate (map-only).
    val quality = docs.filter(
      graft.functions.TextAnalysis.gopherReject(col("text")).isNull)
    // 2. Decontaminate against a held-out eval split (broadcast probe).
    val isEval = pmod(col("doc_id"), lit(10)) === 0
    val contaminated = Decontaminate.ngramHits(
      quality.filter(!isEval), quality.filter(isEval), w = 6)
      .select("doc_id")
    val train = quality.filter(!isEval)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // 3. Near-dup clustering, keep the canonical doc per cluster.
    val cc = Dedup.connectedComponents(
      Dedup.jaccardPairs(train, w = 5, threshold = 0.8).select("i", "j"))
    val deduped = train.join(
      cc.filter(col("doc_id") =!= col("cluster_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")
    // 4. Pack into 512-token training bins per language shard.
    val packed = Packing.contiguousPack(deduped, budget = 512)
    val rows = packed.collect()
    val nDocs = docs.count()
    assert(rows.nonEmpty && rows.length < nDocs,
      s"pipeline must keep a strict subset: ${rows.length} of $nDocs")
    // Survivors: quality-passing, uncontaminated, cluster-canonical.
    val kept = rows.map(r => r.getAs[Long]("doc_id")).toSet
    val contaminatedIds = contaminated.collect().map(_.getLong(0)).toSet
    assert(kept.intersect(contaminatedIds).isEmpty, "no contaminated doc survives")
    val dupIds = cc.filter(col("doc_id") =!= col("cluster_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(dupIds).isEmpty, "no non-canonical duplicate survives")
    // Packing invariant (falsifiable — not the tautological
    // offset < budget): every row's (bin_id, bin_offset) must be
    // exactly the division of its prefix-sum start position.
    rows.foreach { r =>
      val start = r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("bin_id") == start / 512L &&
        r.getAs[Long]("bin_offset") == start % 512L,
        s"bin assignment must be start `div`/`%` budget: $r")
    }
  }

  test("multimodal retrieval composes: media table → features → embedding join → ANN") {
    // Binary media rows flow through feature extraction, join their
    // embeddings on id, and feed similarity search — the multimodal
    // retrieval chain, end-to-end, without collecting media content.
    import graft.operators.{Multimodal, Similarity}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.asMediaTable(docs)
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("n_bytes"))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val joined = feats.join(emb, feats("media_id") === emb("vec_id"))
      .select(col("vec_id"), col("embedding"), col("n_bytes"))
    // Retrieval: top-3 neighbors for the media rows with vec_id < 3.
    val topk = Similarity.bruteTopK(
      joined.select("vec_id", "embedding"), col("vec_id") < 3, k = 3)
    val byQuery = topk.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q must return k=3 neighbors")
    }
  }

  test("semdedup composition: every vector labeled, kept = one per cluster") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Dedup.cosinePairs(emb, threshold = 0.3).select("i", "j")
    val cc = Dedup.connectedComponents(pairs).withColumnRenamed("doc_id", "vec_id")
    val out = emb.select("vec_id").join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .withColumn("kept", col("vec_id") === col("cluster_id"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == emb.count(), "every vector appears in the decision set")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._3) == 1, s"exactly one kept per cluster $cid")
      assert(members.filter(_._3).head._1 == members.map(_._1).min,
        "the canonical member is the min vec_id")
    }
  }
}
