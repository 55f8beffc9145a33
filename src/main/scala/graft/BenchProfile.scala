package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement tool for the optimization rounds (guide §1): runs the
  * SPARK_GRAFT_ONLY-selected queries exactly like [[Bench]] (same
  * session config, same noop sink) but with a job-level listener, so
  * the wall-clock of each query decomposes into its Spark jobs
  * (description, duration, task time) plus the unaccounted driver gap.
  * Reads the same env contract as Bench; never run by the driver. */
object BenchProfile {
  private case class JobRec(id: Int, desc: String, start: Long,
                            var end: Long = 0L, var stages: Int = 0,
                            var tasks: Int = 0, var taskTimeMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Same warm-up as Bench so first-touch listing cost stays out.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val warm = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings").map { t =>
      Future {
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    }
    warm.foreach(Await.ready(_, Duration.Inf))

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    // Driver-gap sampler: while no job is live, sample the main
    // thread's stack and histogram the deepest "interesting" frame —
    // attributes the wall time BETWEEN jobs (planning, manifest IO,
    // codegen, commit protocol) that job metrics can't see.
    val mainThread = Thread.currentThread()
    val gapFrames =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var openJobs = 0
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling && openJobs == 0) {
          val st = mainThread.getStackTrace
          val interesting = st.find { f =>
            val c = f.getClassName
            (c.startsWith("org.apache.spark.sql.catalyst") ||
              c.startsWith("org.apache.spark.sql.execution") ||
              c.startsWith("org.apache.parquet") ||
              c.startsWith("org.apache.hadoop") ||
              c.startsWith("org.codehaus.janino") ||
              c.startsWith("graft")) &&
              !c.contains("Lambda")
          }
          val key = interesting.map(f =>
            s"${f.getClassName.split('.').takeRight(2).mkString(".")}." +
              f.getMethodName).getOrElse(
            st.drop(1).headOption.map(f =>
              s"${f.getClassName}.${f.getMethodName}").getOrElse("idle"))
          gapFrames.merge(key, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
        order.add(e.jobId)
        openJobs += 1
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
        openJobs -= 1
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        // Attribute the stage to the job that owns it (jobId unknown at
        // stage level pre-3.1-style; use the newest open job instead —
        // single-threaded query execution makes this exact here).
        val open = jobs.values().toArray(Array.empty[JobRec])
          .filter(_.end == 0L).sortBy(-_.start).headOption
        open.foreach { j =>
          j.stages += 1
          j.tasks += info.numTasks
          j.taskTimeMs += (for {
            s <- info.submissionTime; c <- info.completionTime
          } yield c - s).getOrElse(0L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val selected = SparkEntry.selectedQueries("profile")
    selected.foreach { case (name, fn) =>
      (1 to reps).foreach { rep =>
        jobs.clear(); order.clear(); gapFrames.clear()
        val t0 = System.nanoTime()
        sampling = true
        try {
          spark.sparkContext.setJobDescription(s"$name")
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        } catch {
          case e: Throwable =>
            System.err.println(s"[profile] $name FAILED: ${e.getMessage}")
        } finally { sampling = false; spark.sparkContext.setJobDescription(null) }
        val wallMs = (System.nanoTime() - t0) / 1e6
        graft.operators.CacheRegistry.releaseAll()
        Thread.sleep(50) // let listener events drain
        val recs = {
          import scala.jdk.CollectionConverters._
          order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
        }
        val jobMs = recs.map(r => (r.end - r.start).max(0L)).sum
        println(f"== $name rep$rep wall=${wallMs}%.0fms jobs=${recs.size} " +
          f"jobTime=${jobMs}ms driverGap=${wallMs - jobMs}%.0fms")
        recs.foreach { r =>
          val d = (r.end - r.start).max(0L)
          if (d >= 20)
            println(f"   job ${r.id}%3d ${d}%6dms stages=${r.stages}%2d " +
              f"tasks=${r.tasks}%4d taskTime=${r.taskTimeMs}%6dms  ${r.desc.take(90)}")
        }
        import scala.jdk.CollectionConverters._
        val gf = gapFrames.asScala.toSeq.sortBy(-_._2.intValue).take(14)
        gf.foreach { case (k, n) =>
          println(f"   gap ${n.intValue * 5}%6dms  $k")
        }
      }
    }
    spark.stop()
  }
}
