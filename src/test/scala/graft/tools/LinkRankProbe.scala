package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CacheRegistry, Graph}

/** Stage-split probe for q_link_rank (Test/runMain
  * graft.tools.LinkRankProbe [sfDir]) — times the edge build, the
  * cache materialization, and each added PageRank iteration
  * separately so a bench regression can be attributed to a phase
  * instead of guessed at. Not a product entry point. */
object LinkRankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parallelismFirst = args.drop(1).headOption.getOrElse("false")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", parallelismFirst)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for (s <- si.submissionTime; c <- si.completionTime) yield c - s
        if (dur.exists(_ > 300))
          println(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
            f"${dur.get}%6d ms  ${si.name.take(90)}")
      }
    })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    time("warm scans")(li.count() + ord.count())
    // Tag-bit node encoding, kept in lockstep with q_link_rank —
    // an additive offset collides once the supplier key space
    // outgrows it.
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck")).distinct()
    val edges = pairs
      .select((col("sk") * 2L).as("src"), (col("ck") * 2L + 1L).as("dst"))
      .union(pairs.select((col("ck") * 2L + 1L).as("src"),
        (col("sk") * 2L).as("dst")))
    val nEdges = time("edge build (count)")(edges.count())
    println(s"[probe] edges=$nEdges")
    // Fixed-part breakdown (mirrors pageRankFixed's internals).
    val e = time("e persist+count") {
      val x = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).persist()
      x.count(); x
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    time("nodes distinct count")(nodes.count())
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    val spine = time("spine persist+count") {
      val x = nodes.crossJoin(broadcast(n))
        .select(col("node"), expr("CAST(1000000000 AS BIGINT) div n_nodes").as("r0"),
          expr("(15 * (CAST(1000000000 AS BIGINT) div n_nodes)) div 100").as("base"))
        .persist()
      x.count(); x
    }
    val ed = time("ed persist+count") {
      val x = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src").persist()
      x.count(); x
    }
    var ranks = spine.select(col("node"), col("r0").as("r"))
    for (i <- 1 to 3) {
      time(s"iteration $i (noop)") {
        val inc = ed.join(ranks.withColumnRenamed("node", "src")
            .withColumnRenamed("r", "rsrc"), "src")
          .select(col("dst").as("node"), expr("rsrc div deg").as("c"))
          .groupBy("node").agg(sum("c").as("inc"))
        ranks = spine.join(inc, Seq("node"), "left")
          .select(col("node"),
            (col("base") + expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) div 100")).as("r"))
        ranks.write.mode("overwrite").format("noop").save()
      }
    }
    Seq(e, spine, ed).foreach(_.unpersist())
    for (iters <- Seq(1, 3)) {
      val reg = new CacheRegistry
      time(s"pageRank iters=$iters") {
        Graph.pageRankFixed(edges, iters, registry = reg)
          .orderBy(col("r").desc, col("node").asc).limit(20)
          .write.mode("overwrite").format("noop").save()
      }
      reg.releaseAll()
    }
    spark.stop()
  }
}
