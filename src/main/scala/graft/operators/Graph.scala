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

  /** Support-weighted co-purchase edge list from an order-lines fact
    * table — `(u, v, w)` with `u < v`, `w` = number of orders whose
    * baskets contain both parts, `w >= minSupport`. Baskets fold into
    * per-order part SETS in ONE order-keyed exchange (map-side partial
    * collect_set — never a fact-table self-join, which would shuffle
    * the corpus twice and join it against itself); pairs then explode
    * ROW-LOCALLY (order-bounded: ~lines² per basket), and the support
    * filter rides the pair aggregate. This is the shared substrate of
    * the whole graph query family (triangles, clustering coefficient,
    * assortativity, degree distribution, components). */
  def copurchaseEdgeList(lineitem: DataFrame,
                         minSupport: Int = 2): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_set("pk").as("parts"))
      .select(explode(col("parts")).as("a"), col("parts"))
      .select(col("a"), explode(col("parts")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a").as("u"), col("b").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
  }

  /** Materialize [[copurchaseEdgeList]] as a bucketed catalog table —
    * the [[graft.operators.Dedup.writeMinhashIndex]] pattern applied
    * to the graph family. At 100 TB you would never re-derive a
    * trillion-edge list per query: the edge build (the fact-table
    * aggregate + pair explode) runs ONCE, and every consumer reads
    * `(u, v, w)` rows bucketed by `u`, so u-keyed joins/aggregates
    * plan with zero Exchange on the edge side (pinned in
    * ScaleOpsSpec) and per-query cost drops to a thin bucketed scan
    * plus the query's own work. The weight column is kept so one
    * index serves every support threshold >= the build's
    * (`w >= k` filters are a row-group-prunable scan predicate, and
    * support-k edges are exactly the `w >= k` subset). */
  def writeCopurchaseIndex(lineitem: DataFrame, table: String,
                           minSupport: Int = 2,
                           nBuckets: Int = 16): Unit =
    graft.sources.Warehouse.writeBucketed(
      copurchaseEdgeList(lineitem, minSupport), table, "u", nBuckets)

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

  /** Triangle census of an undirected graph — node/edge/wedge counts,
    * the exact triangle count, and the global clustering coefficient
    * 3·T/W (the "how clique-y is this graph" number behind community
    * detection and link-spam audits).
    *
    * `edges` must hold each undirected edge ONCE as `(u: bigint,
    * v: bigint)` with `u < v` and no self-loops (caller dedups).
    *
    * Algorithm: degree-ordered orientation (the compact-forward /
    * node-iterator-core scheme; Schank & Wagner, "Finding, Counting
    * and Listing all Triangles in Large Graphs", WEA 2005). Each edge
    * is oriented from its lower endpoint to its higher endpoint in
    * the total order (degree, node-id); a triangle {a,b,c} then has
    * EXACTLY one node with two out-edges (its orientation-minimum),
    * so counting (wedge at s) ⋈ (closing oriented edge) counts each
    * triangle once — no ×6 overcount, no post-hoc distinct. The
    * orientation is the scale lever: out-degree is bounded by
    * O(√(2m)) regardless of how skewed the raw degree distribution
    * is (a hub of degree 10⁶ contributes wedges only through its
    * LOW-degree incident edges), so the wedge self-join — the only
    * superlinear step — is Σ outdeg² ≤ m·√(2m) instead of Σ deg²,
    * and every step is an equi-join (shuffle on node/pair keys, no
    * cartesian anywhere). All outputs are exact integers; the one
    * float (3·T/W) is a single rounded division. */
  def triangleStats(edgesIn: DataFrame,
                    registry: CacheRegistry = CacheRegistry.global)
      : DataFrame = {
    // The edge list feeds four consumers (degree table, orientation
    // join, closing-edge probe, edge count) and the oriented form
    // three — persist both or the caller's edge build re-executes per
    // consumer. Both are (long, long[, long]) rows: cache bytes are
    // O(m), tiny next to the wedge join they amortize.
    val edges = registry.track(edgesIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    val e = edges
      .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
    val uFirst = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    // Oriented edge (s → t) with t's degree carried so wedge pairs can
    // re-derive the SAME total order without another deg join.
    val eo = registry.track(e.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"),
      when(uFirst, col("dv")).otherwise(col("du")).as("tdg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bFirst = (col("e1.tdg") < col("e2.tdg")) ||
      (col("e1.tdg") === col("e2.tdg") && col("e1.t") < col("e2.t"))
    // Each unordered out-neighbor pair {b, c} once (e1.t < e2.t), then
    // normalized into orientation order — the closing edge {b, c} is
    // stored oriented low→high in the same (deg, id) order, so the
    // triangle probe is a plain equi-join on (b, c).
    val wedges = eo.as("e1").join(eo.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(
        when(bFirst, col("e1.t")).otherwise(col("e2.t")).as("b"),
        when(bFirst, col("e2.t")).otherwise(col("e1.t")).as("c"))
    val tri = wedges.join(
      eo.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    // Single-row aggregates compose via broadcast crossJoin (the
    // q_bigram_pmi precedent) — no driver-side action.
    val nodeSide = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum((dg * (dg - 1)) div 2)").as("n_wedges"))
    val edgeSide = edges.agg(count(lit(1)).as("n_edges"))
    val triSide = tri.agg(count(lit(1)).as("n_triangles"))
    nodeSide.crossJoin(broadcast(edgeSide)).crossJoin(broadcast(triSide))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        graft.functions.TextAnalysis.roundStable(
          when(col("n_wedges") > 0,
            lit(3.0) * col("n_triangles") / col("n_wedges")), 6)
          .as("global_cc"))
  }

  /** Multi-source BFS hop distance over an undirected edge list —
    * `(node, hops)` = fewest edges from ANY seed, for every node
    * within `maxHops` (unreached nodes are absent). The "blast
    * radius" primitive: which products sit within k links of a
    * recalled part, which documents within k dup-links of a
    * known-bad source.
    *
    * Level-synchronous frontier expansion (the standard distributed
    * BFS): per hop, ONLY the newly-discovered frontier joins the
    * (symmetrized) edge list — one src-keyed equi-join plus one
    * min-hop aggregate per level, so the shuffle bytes per level are
    * O(frontier·avg_degree), never corpus-sized, and `maxHops` bounds
    * the rounds. With the edge table bucketed by its source column
    * (the materialized co-purchase/trade index layout) the edge side
    * joins pre-partitioned. The distance table re-aggregates with
    * min() each level, so a node reached by two levels keeps the
    * smaller — exact BFS semantics regardless of join order; lineage
    * is cut per level (localCheckpoint) to keep analysis linear in
    * `maxHops`. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
              registry: CacheRegistry = CacheRegistry.global): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64,
      s"bfsHops: maxHops must be in [0, 64], got $maxHops")
    val sym = registry.track(
      edges.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var dist = seeds.select(col("node"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = dist
    var h = 1
    while (h <= maxHops) {
      val next = frontier.join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), lit(h.toLong).as("hops"))
        .distinct()
      // New frontier = discovered-this-level minus already-known;
      // dist keeps the min hop per node.
      frontier = next.join(dist.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .localCheckpoint(true)
      dist = dist.unionByName(frontier)
        .groupBy("node").agg(min("hops").as("hops"))
        .localCheckpoint(true)
      h += 1
    }
    dist
  }

  /** Per-node triangle participation — `(node, dg, tri)` for every
    * node of the graph, `tri = 0` where none (the inputs of the LOCAL
    * clustering coefficient 2·tri/(dg·(dg−1)), the per-node "how
    * cliquish is my neighborhood" score behind spam-hub and community
    * audits; [[triangleStats]] answers the same question globally).
    *
    * Same edge contract and Schank–Wagner degree-ordered orientation
    * as [[triangleStats]] — the wedge self-join stays ≤ m·√(2m) under
    * any skew — but each closed triangle keeps its THREE corners,
    * which explode row-locally (3 rows per triangle, never a corpus
    * re-shuffle) into a node-keyed count. The closing left join gives
    * triangle-less nodes their zero instead of dropping them. */
  def localTriangleCounts(edgesIn: DataFrame,
                          registry: CacheRegistry = CacheRegistry.global)
      : DataFrame = {
    val edges = registry.track(edgesIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Degrees feed the orientation join twice AND the final zero-fill
    // join — persist, or the caller's edge build runs per consumer.
    val deg = registry.track(edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val e = edges
      .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
    val uFirst = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    val eo = registry.track(e.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"),
      when(uFirst, col("dv")).otherwise(col("du")).as("tdg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bFirst = (col("e1.tdg") < col("e2.tdg")) ||
      (col("e1.tdg") === col("e2.tdg") && col("e1.t") < col("e2.t"))
    val wedges = eo.as("e1").join(eo.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"),
        when(bFirst, col("e1.t")).otherwise(col("e2.t")).as("b"),
        when(bFirst, col("e2.t")).otherwise(col("e1.t")).as("c"))
    val tri = wedges.join(
      eo.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    val tc = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(tc, Seq("node"), "left")
      .select(col("node"), col("dg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
  }
}
