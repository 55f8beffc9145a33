package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis over edge tables — the second half of the graph
  * family next to [[Dedup.connectedComponents]]: where CC answers
  * "which documents are the same", PageRank answers "which nodes
  * matter", the canonical importance prior for crawl scheduling and
  * source weighting in a web-scale training-data pipeline (Page et
  * al., "The PageRank Citation Ranking", Stanford InfoLab 1999).
  *
  * INTEGER-ARITHMETIC fixpoint: ranks are carried as integer
  * probability units (parts-per-`total`), every division is floor
  * division, and every per-iteration reduction is a sum of longs —
  * exact, associative, commutative. That buys two things a floating
  * PageRank cannot have: (a) results are BIT-IDENTICAL across
  * engines, partitionings and merge orders (a double-sum PageRank's
  * low bits depend on reduction order), and (b) the mass accounting
  * is auditable (what floor division drops is dropped
  * deterministically). The few units floor division sheds per node
  * per iteration are a rounding bias of ~1/total, far below any
  * ranking-relevant signal at total = 1e9.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list
    * (`src: bigint, dst: bigint`; caller dedups if edge multiplicity
    * is not intended — multi-edges weight the transition).
    *
    * Update rule per iteration, all in long arithmetic:
    * {{{
    *   share   = total div N                      // uniform start
    *   contrib = r(src) div outdeg(src)           // per edge
    *   r'(v)   = ((dampDen-dampNum)*share) div dampDen
    *           + (dampNum * sum(contrib into v)) div dampDen
    * }}}
    * Dangling nodes (no out-edges) leak their mass — the classic
    * simplified formulation; feed a symmetrized edge list (as
    * q_link_rank does) if mass conservation matters.
    *
    * Scale shape: one static edges⋈outdeg table; per iteration ONE
    * shuffle that matters — the contribution sum keyed by dst (the
    * rank join is node-sized and AQE-broadcastable; at web scale,
    * co-partition edges and ranks by src so it plans shuffle-free).
    * The node count is taken as ONE driver scalar action (it
    * materializes the node cache as a side effect) so the teleport
    * constants ride as literals — a spine table carrying them would
    * re-derive the node set once per reference. Past
    * `checkpointEvery` iterations the rank lineage is cut with an
    * eager localCheckpoint to keep analysis cost linear. */
  def pageRankFixed(edges: DataFrame,
                    iters: Int,
                    total: Long = 1000000000L,
                    dampNum: Int = 85,
                    dampDen: Int = 100,
                    checkpointEvery: Int = 6,
                    registry: CacheRegistry = CacheRegistry.global): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"pageRankFixed: iters must be in [1, 100], got $iters")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"pageRankFixed: damping $dampNum/$dampDen out of [0, 1]")
    // The edge list is the ONLY expensive lineage (the caller's joins
    // + distinct) and every downstream table — outdegrees, the node
    // set, each iteration's contribution join — re-derives it per
    // appearance in the (single, lazy) plan unless persisted: Spark
    // does not deduplicate common subplans above the exchange level.
    // Persist it FIRST, then derive everything from the cache. The
    // coalesce keeps a union-of-branches input (2x partition count)
    // from doubling every downstream stage's task count — the work is
    // bytes-bound, not partition-bound. Caller's registry releases
    // all three caches after its action.
    val sel = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val par = edges.sparkSession.sparkContext.defaultParallelism
    val e = registry.track(
      (if (sel.rdd.getNumPartitions > par) sel.coalesce(par) else sel).persist())
    val nodes = registry.track(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist())
    // ONE driver scalar (also materializes e + nodes): the teleport
    // constants become literals. Long division == SQL `div` here.
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRankFixed: empty graph")
    val share = total / nNodes
    val base = ((dampDen - dampNum) * share) / dampDen
    val ed = registry.track(
      e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src").persist())
    var ranks = nodes.select(col("node"), lit(share).as("r"))
    var it = 1
    while (it <= iters) {
      val inc = ed
        .join(ranks.withColumnRenamed("node", "src").withColumnRenamed("r", "rsrc"),
          "src")
        .select(col("dst").as("node"), expr("rsrc div deg").as("c"))
        .groupBy("node").agg(sum("c").as("inc"))
      ranks = nodes.join(inc, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampNum * coalesce(inc, CAST(0 AS BIGINT))) div $dampDen"))
            .as("r"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint(true)
      it += 1
    }
    ranks
  }
}
