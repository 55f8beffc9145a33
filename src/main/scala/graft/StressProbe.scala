package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch scaling probe (not part of the library surface): replicate
  * the sf0.1 documents corpus 10x with distinct ids and time the
  * near-dup family, to observe the scaling slope vs sf0.1. */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until 10).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", when(lit(i) === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep" + i))))
    ).reduce(_ unionByName _).repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress] corpus: ${big.count()} docs")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stress] $name: ${(System.nanoTime()-t0)/1e9}%.1fs, $n rows")
      // Drop the probe's persisted intermediates (the char path pins
      // its distinct-shingle table) so later probes aren't timed under
      // a dead cache's storage-memory pressure.
      graft.operators.CacheRegistry.global.releaseAll()
    }
    time("jaccard")  { Dedup.jaccardPairs(big).count() }
    time("char_jaccard") { Dedup.charJaccardPairs(big).count() }
    time("minhash")  { Dedup.minHashCandidates(big).count() }
    time("simhash")  { Dedup.simHashPairs(big).count() }
    // Star-contraction CC over the ~250k-pair minhash candidate graph
    // (clusters of ~10 replicas): candidates are materialized OUTSIDE
    // the timed block so the number is the CC slope alone, not a
    // second candidate-generation pass.
    val ccPairs = Dedup.minHashCandidates(big).select("i", "j")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ccPairs.count()
    time("minhash_cc") { Dedup.connectedComponents(ccPairs).count() }
    ccPairs.unpersist()
    // Decontamination at 50k train docs vs a 5k-doc eval split: the
    // train side is map-only into the broadcast probe, so this should
    // track the corpus SCAN time, not the near-dup join times.
    time("decontaminate") {
      graft.operators.Decontaminate.ngramHits(
        big.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        big.filter(pmod(col("doc_id"), lit(10)) === 0), w = 6).count()
    }
    // Embedding LSH at 10× corpus: near-twin per original (tiny
    // deterministic perturbation on unit vectors), bandBits raised to
    // 16 — the documented knob: collision volume per band is n²/2^16
    // here vs n²/2^8 at the 8×8 default, which is the difference
    // between a bounded candidate join and a quadratic one at 50k+.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bigEmb = (0 until 10).map(i =>
      if (i == 0) emb
      else emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        transform(col("embedding"), (x, p) =>
          (x + lit(0.05) * (pmod(xxhash64(col("vec_id") * 1000L + p + lit(i.toLong)),
            lit(1000L)).cast("double") / 1000.0 - 0.5)).cast("float"))
          .as("embedding"))
    ).reduce(_ unionByName _).repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress] embedding corpus: ${bigEmb.count()} vectors")
    time("cosine_lsh_16x4") {
      Dedup.cosineLshPairs(bigEmb, threshold = 0.95, bandBits = 16,
        numBands = 4).count()
    }
    // Hot-key as-of: 20M left + 2M right rows ALL on one key — the
    // plain form sorts the whole timeline in one window task; the
    // bucketed form spreads it over (key, hour-bucket) partitions.
    import graft.operators.TemporalJoins
    val leftHot = spark.range(20000000L).selectExpr("id AS lid",
      "CAST(1 AS LONG) AS k", "timestamp_seconds(1704067200 + id) AS t")
    val rightHot = spark.range(2000000L).selectExpr("CAST(1 AS LONG) AS k",
      "timestamp_seconds(1704067200 + id * 10) AS t", "id AS tag")
    // noop sink, NOT count(): count() lets Catalyst prune the carried
    // window columns and skip the sort entirely.
    def timeNoop(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    timeNoop("asof_hotkey_plain")(
      TemporalJoins.asofJoin(leftHot, rightHot, Seq("k"), "t", "t", Seq("tag")))
    timeNoop("asof_hotkey_bucketed")(
      TemporalJoins.asofJoinBucketed(leftHot, rightHot, Seq("k"), "t", "t",
        Seq("tag"), bucketSpanSeconds = 3600L))
    // PageRank slope: a synthetic 10M-edge / 1M-node graph (hash-mixed
    // endpoints — connected, skewed in/out degrees like a real link
    // graph). q_link_rank's sf0.1 graph is 1.17M edges; this is ~10×,
    // so ~linear wall growth is the pass signal for the O(E)/iteration
    // claim.
    val bigEdges = spark.range(10000000L).selectExpr(
      "pmod(xxhash64(id), 1000000L) AS src",
      "pmod(xxhash64(id + 77L), 1000000L) AS dst")
      .filter(col("src") =!= col("dst"))
    locally {
      val reg = new graft.operators.CacheRegistry
      val t0 = System.nanoTime()
      graft.operators.Graph.pageRankFixed(bigEdges, iters = 3, registry = reg)
        .write.mode("overwrite").format("noop").save()
      println(f"[stress] pagerank_10m_edges_3it: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      reg.releaseAll()
    }
    // Bloom vs sorted-set probe throughput over the 50k-doc corpus:
    // same gram stream, same contamination decision shape — the bloom
    // rides ~12 bits/gram vs the sorted set's 64, and the probe is
    // O(k) bit tests vs O(log E) cache-missing binary search.
    locally {
      val evalSide = big.filter(pmod(col("doc_id"), lit(10)) === 0)
      val trainSide = big.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val grams = graft.operators.Decontaminate.collectEvalGrams(evalSide, w = 6)
      println(s"[stress] eval grams: ${grams.length} " +
        s"(sorted ${grams.length * 8 / 1024} KiB)")
      val bloom = graft.operators.Decontaminate.bloomBits(grams)
      println(s"[stress] bloom bits: ${bloom.bits.length * 8 / 1024} KiB")
      time("decon_probe_sorted") {
        trainSide.filter(graft.operators.Decontaminate
          .contaminationFlag(col("text"), grams, w = 6)).count()
      }
      time("decon_probe_bloom") {
        trainSide.filter(graft.operators.Decontaminate
          .bloomCandidateFlag(col("text"), bloom, w = 6)).count()
      }
    }
    // Group-top-k on HOT groups: 20M rows over 8 groups. The window
    // form must sort a 2.5M-row partition per group; the bounded-heap
    // aggregate keeps 10 entries per (partition, group) and combines
    // map-side — the shuffle carries ~8x10 rows total.
    locally {
      val hot = spark.range(20000000L).selectExpr("pmod(id, 8L) AS g",
        "CAST(pmod(xxhash64(id), 1000000L) AS DOUBLE) AS score", "id AS rid")
      timeNoop("group_topk_heap_20m") {
        hot.groupBy("g")
          .agg(graft.plans.GraftFunctions.topKByScore(
            col("score"), col("rid"), 10).as("top"))
          .select(col("g"), explode(col("top")).as("e"))
      }
      timeNoop("group_topk_window_20m") {
        hot.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("g").orderBy(col("score").desc, col("rid"))))
          .filter(col("rn") <= 10)
      }
    }
    // ANN family at 1M vectors (synthetic 64-dim, deterministic
    // hash-derived floats — sf0.1 only carries 2k embeddings, far too
    // small to show slopes): quantizers train on a 2% SAMPLE (the
    // production pattern), the full corpus assigns/encodes map-only.
    // The multiplicative story: brute = full float scan; trained IVF
    // = 1/64 of it; PQ = full scan over 32×-smaller codes; IVF×PQ =
    // both at once.
    locally {
      import graft.operators.{Kmeans, Pq, Similarity}
      val synth = spark.range(1000000L).select(col("id").as("vec_id"),
          expr("transform(sequence(0, 63), p -> " +
            "CAST(pmod(xxhash64(id * 64 + p), 2000) / 1000.0 - 1.0 AS FLOAT))")
            .as("embedding"))
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[stress] ann corpus: ${synth.count()} vectors")
      val sample = synth.filter(pmod(col("vec_id"), lit(50)) === 0)
      val pred = col("vec_id") < 8
      timeNoop("ann_brute_cosine_1m")(
        Similarity.bruteTopK(synth, pred, k = 5))
      var t0 = System.nanoTime()
      val cents = Kmeans.train(sample, 64, 2)
      println(f"[stress] ann_kmeans_train_64c_2it_20k: ${(System.nanoTime()-t0)/1e9}%.1fs")
      val ivfDir = java.nio.file.Files.createTempDirectory("stress-ivf")
        .toString + "/idx"
      t0 = System.nanoTime()
      Similarity.writeIvfIndexTrained(synth, ivfDir, cents)
      println(f"[stress] ann_ivf_build_1m: ${(System.nanoTime()-t0)/1e9}%.1fs")
      timeNoop("ann_ivf_probe1_of_64")(
        Similarity.ivfTopKIndexedTrained(spark, ivfDir, pred, k = 5))
      t0 = System.nanoTime()
      val cbs = Pq.train(sample, m = 8, k = 16, iters = 2)
      println(f"[stress] ann_pq_train_8x16_2it_20k: ${(System.nanoTime()-t0)/1e9}%.1fs")
      val pqDir = java.nio.file.Files.createTempDirectory("stress-pq")
        .toString + "/idx"
      t0 = System.nanoTime()
      Pq.writePqIndex(synth, pqDir, cbs)
      println(f"[stress] ann_pq_encode_1m: ${(System.nanoTime()-t0)/1e9}%.1fs")
      timeNoop("ann_pq_adc_full_scan_1m")(
        Pq.pqTopK(spark, pqDir, synth, pred, k = 5))
      val ivfpqDir = java.nio.file.Files.createTempDirectory("stress-ivfpq")
        .toString + "/idx"
      Pq.writeIvfPqIndex(synth, ivfpqDir, cents, cbs)
      timeNoop("ann_ivfpq_probe4_of_64")(
        Pq.ivfPqTopK(spark, ivfpqDir, synth, pred, k = 5, probes = 4))
      synth.unpersist()
    }
    spark.stop()
  }
}
