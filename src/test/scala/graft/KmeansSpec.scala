package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Kmeans

/** Integer-exact distributed k-means: bit-identical centroids under
  * any partitioning, deterministic tie-breaks, empty-cell handling,
  * and the identical-vector ⇒ identical-cell property the
  * oracle-checked ANN query rests on. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("centroids are bit-identical under different partitionings") {
    val a = Kmeans.train(emb, 8, 3)
    val b = Kmeans.train(emb.repartition(13), 8, 3)
    val c = Kmeans.train(emb.coalesce(1), 8, 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq == c.map(_.toSeq).toSeq)
    // And training actually moved the centroids off their seeds.
    val seeds = emb.orderBy("vec_id").limit(8).collect()
      .map(_.getSeq[Float](1).map(x => math.round(x * 65536.0)).toSeq)
    assert(a.map(_.toSeq).toSeq != seeds.toSeq, "Lloyd rounds must update")
  }

  test("assignment: nearest centroid, (dist, cid) tie-break, full coverage") {
    val cents = Kmeans.train(emb, 8, 2)
    val assigned = Kmeans.assign(
      emb.select(col("vec_id"), Kmeans.quantize(col("embedding")).as("qv")),
      cents)
    assert(assigned.count() == emb.count(), "every vector assigned once")
    val cids = assigned.select("cid").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cids.subsetOf((0 until 8).toSet))
    assert(cids.size >= 4, s"degenerate clustering: only $cids")
    // Brute-force check on a sample: the assigned cell minimizes the
    // exact integer distance (ties to the smaller cid).
    val sample = assigned.filter(col("vec_id") < 20).collect()
    sample.foreach { r =>
      val qv = r.getSeq[Long](1).toArray
      val best = cents.zipWithIndex.map { case (cv, i) =>
        (cv.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.min
      assert(r.getInt(2) == best._2, s"vec ${r.getLong(0)}")
    }
  }

  test("identical vectors share a cell; planted twin is the dist-0 top-1") {
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(planted)
    val cents = Kmeans.train(corpus, 4, 2)
    val out = Kmeans.ivfTopOne(corpus, cents, col("vec_id") >= 500000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 10L).foreach { i =>
      assert(out(500000L + i) == (i, 0L), s"twin of $i lost")
    }
  }

  test("probe plan: queries broadcast, no sort-merge join, no corpus window") {
    val cents = Kmeans.train(emb, 8, 1)
    val p = Kmeans.ivfTopOne(emb, cents, col("vec_id") < 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe must not sort-merge:\n$p")
    assert(!p.contains("Window"), s"argmin is an aggregate, not a window:\n$p")
  }

  test("k exceeding distinct vectors fails loudly; empty cells keep centroids") {
    intercept[IllegalArgumentException] {
      Kmeans.train(emb.limit(3), 8, 1)
    }
    // NULL embeddings fail the job loudly (no silent argmin dropout).
    val withNull = Seq((0L, Array(1f, 2f)), (1L, null: Array[Float]),
      (2L, Array(3f, 4f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Kmeans.train(withNull, 2, 1) }
    assert(e.getMessage != null &&
      (e.getMessage.contains("NULL embedding") ||
        e.getCause != null && e.getCause.getMessage.contains("NULL embedding")),
      s"unexpected failure: $e")
    // Two far clusters + k=3 seeded inside them: at least one cell
    // ends empty and must keep its previous centroid (no NaN/zero
    // poisoning).
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.001f, 0f)), (2L, Array(0f, 0.001f)),
      (3L, Array(10f, 10f)), (4L, Array(10.001f, 10f)))
      .toDF("vec_id", "embedding")
    val cents = Kmeans.train(pts, 3, 3)
    assert(cents.length == 3)
    assert(cents.forall(_.length == 2))
    // Assignment still total and deterministic.
    val assigned = Kmeans.assign(
      pts.select(col("vec_id"), Kmeans.quantize(col("embedding")).as("qv")),
      cents)
    assert(assigned.count() == 5)
  }
}
