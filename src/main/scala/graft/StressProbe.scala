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
    spark.stop()
  }
}
