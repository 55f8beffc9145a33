package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only timing probe for the q_semdedup_lsh composition: splits
  * LSH pair generation from the CC loop and the keep-set join so perf
  * work targets the right stage. Test scope — never ships. */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val twins = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      col("embedding"))
    val corpus = emb.unionByName(twins)
    (1 to 2).foreach { rep =>
      val pairs = time(s"rep$rep lsh pairs")(
        Dedup.cosineLshPairs(corpus, threshold = 0.9,
          bandBits = 16, numBands = 4).select("i", "j")
          .persist())
      println(s"[probe] pair count: ${time(s"rep$rep pairs materialize")(pairs.count())}")
      val cc = time(s"rep$rep cc")(
        Dedup.connectedComponents(pairs).persist())
      cc.count()
      time(s"rep$rep keep join")(
        corpus.select("vec_id")
          .join(cc.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
          .write.mode("overwrite").format("noop").save())
      pairs.unpersist(); cc.unpersist()
      graft.operators.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
