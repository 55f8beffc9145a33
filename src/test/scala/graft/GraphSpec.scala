package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Integer PageRank must match an independently-written single-machine
  * reference bit-for-bit — that's the whole point of the integer
  * formulation. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Straight-line reference: same recurrence, scala Maps, no Spark.
    * Written against the formula, not the operator code. */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int,
                          total: Long = 1000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val share = total / n
    val base = (15L * share) / 100L
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> share).toMap
    for (_ <- 1 to iters) {
      val inc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s, d) => inc(d) += r(s) / deg(s) }
      r = nodes.map(v => v -> (base + (85L * inc(v)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int,
                  checkpointEvery: Int = 6): Map[Long, Long] =
    Graph.pageRankFixed(
        edges.toDF("src", "dst").repartition(parts), iters,
        checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is a fixed point at exactly total/2 each") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val got = run(edges, iters = 3, parts = 2)
    assert(got == Map(1L -> 500000000L, 2L -> 500000000L), got)
  }

  test("symmetrized star: center accumulates, leaves match reference exactly") {
    val leaves = (2L to 6L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    val want = referencePr(edges, iters = 4)
    val got = run(edges, iters = 4, parts = 3)
    assert(got == want, s"got=$got want=$want")
    assert(got(1L) > got(2L), "hub must outrank a leaf")
  }

  test("random graphs match the reference bit-for-bit at every partitioning") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 20 + trial * 15
      val edges = (0 until n * 3).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val want = referencePr(edges, iters = 3)
      for (parts <- Seq(1, 5)) {
        val got = run(edges, iters = 3, parts = parts)
        assert(got == want, s"trial=$trial parts=$parts")
      }
    }
  }

  test("checkpointed long run equals the unchckpointed lineage") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 60).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter { case (a, b) => a != b }.distinct
    val want = referencePr(edges, iters = 8)
    // checkpointEvery=3 exercises the localCheckpoint branch twice.
    assert(run(edges, iters = 8, parts = 2, checkpointEvery = 3) == want)
    assert(run(edges, iters = 8, parts = 2, checkpointEvery = 0) == want)
  }

  test("dangling sinks leak mass; symmetric graphs conserve it (mod floor)") {
    // Pure sink: 1→2 with no return edge — node 1's mass drains to the
    // teleport term by iteration 2.
    val got = run(Seq((1L, 2L), (3L, 2L), (3L, 1L)), iters = 3, parts = 1)
    val total = got.values.sum
    assert(total < 1000000000L, "dangling sink must leak mass")
    // Symmetric: mass stays within floor-division loss of total.
    val sym = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)), iters = 3, parts = 1)
    val symTotal = sym.values.sum
    assert(symTotal <= 1000000000L && symTotal > 999999900L,
      s"symmetric graph lost too much mass: $symTotal")
  }

  /** Straight-line triangle reference: brute-force over all ordered
    * triples. Written against the definition, not the operator. */
  private def referenceTriangles(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val es = edges.toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = nodes.map(n =>
      n -> edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    def has(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
    val ids = nodes.sorted
    var tri = 0L
    for {
      i <- ids.indices; j <- (i + 1) until ids.size
      if has(ids(i), ids(j))
      k <- (j + 1) until ids.size
      if has(ids(i), ids(k)) && has(ids(j), ids(k))
    } tri += 1
    (nodes.size.toLong, wedges, tri)
  }

  private def triStats(edges: Seq[(Long, Long)], parts: Int): (Long, Long, Long, Long) =
    try {
      val r = Graph.triangleStats(edges.toDF("u", "v").repartition(parts))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    } finally graft.operators.CacheRegistry.releaseAll()

  test("triangle census matches brute force on crafted shapes") {
    // K4 (4 triangles), a chain (0), a star (0), K4 + pendant.
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    assert(triStats(k4, 2) == ((4L, 6L, 12L, 4L)))
    val chain = Seq((1L,2L),(2L,3L),(3L,4L))
    assert(triStats(chain, 1)._4 == 0L)
    val star = (2L to 6L).map(l => (1L, l))
    assert(triStats(star, 2)._4 == 0L)
  }

  /** Per-node triangle reference, written against the definition. */
  private def referenceLocalTri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def has(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
    val tri = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if has(nodes(i), nodes(j))
      k <- (j + 1) until nodes.size
      if has(nodes(i), nodes(k)) && has(nodes(j), nodes(k))
    } { tri(nodes(i)) += 1; tri(nodes(j)) += 1; tri(nodes(k)) += 1 }
    nodes.map(n => n -> tri(n)).toMap
  }

  test("localTriangleCounts matches brute force, zero-fills, across partitionings") {
    val rnd = new scala.util.Random(11)
    val cases = Seq(
      // K4 + pendant: pendant node must appear with tri=0.
      Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L))) ++
      (0 until 2).map { trial =>
        val n = 14 + trial * 6
        (0 until n * 3).map { _ =>
          val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
          (math.min(a, b), math.max(a, b))
        }.filter { case (a, b) => a != b }.distinct
      }
    for (edges <- cases; parts <- Seq(1, 4)) {
      val want = referenceLocalTri(edges)
      val wantDeg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val got =
        try Graph.localTriangleCounts(
            edges.toDF("u", "v").repartition(parts))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        finally graft.operators.CacheRegistry.releaseAll()
      assert(got.keySet == want.keySet,
        s"node set mismatch parts=$parts: ${got.keySet} vs ${want.keySet}")
      for ((n, (dg, tri)) <- got) {
        assert(dg == wantDeg(n), s"deg($n)=$dg want ${wantDeg(n)}")
        assert(tri == want(n), s"tri($n)=$tri want ${want(n)}")
      }
    }
  }

  test("triangle census matches brute force on random graphs at every partitioning") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 8
      val edges = (0 until n * 3).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter { case (a, b) => a != b }.distinct
      val (nn, nw, nt) = referenceTriangles(edges)
      for (parts <- Seq(1, 4)) {
        val (gn, ge, gw, gt) = triStats(edges, parts)
        assert((gn, ge, gw, gt) == ((nn, edges.size.toLong, nw, nt)),
          s"trial=$trial parts=$parts got=($gn,$ge,$gw,$gt) want=($nn,${edges.size},$nw,$nt)")
      }
    }
  }

  /** Straight-line BFS reference: plain queue, scala Maps, no Spark.
    * Written against the definition, not the operator code. */
  private def referenceBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                           maxHops: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("bfsHops matches the reference on chains, forks, and random graphs") {
    def run(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int) = {
      val reg = new graft.operators.CacheRegistry
      try Graph.bfsHops(edges.toDF("u", "v"), seeds.toDF("node"), maxHops,
          reg).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally reg.releaseAll()
    }
    // Chain 0-1-2-3-4-5: hop cap cuts the tail; two seeds take min.
    val chain = (0L until 5L).map(i => (i, i + 1))
    assert(run(chain, Seq(0L), 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(run(chain, Seq(0L, 5L), 2) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 5L -> 0L, 4L -> 1L, 3L -> 2L))
    // maxHops=0 returns exactly the seeds.
    assert(run(chain, Seq(2L), 0) == Map(2L -> 0L))
    // Random graphs, several shapes/seeds, vs the reference.
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val edges = (1 to n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val seeds = Seq(0L, (n / 2).toLong)
      val want = referenceBfs(edges, seeds, 4)
      val got = run(edges, seeds, 4)
      assert(got == want, s"trial=$trial: ${got.size} vs ${want.size}")
    }
  }
}
