package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Ranking

/** graft.operators.Ranking — the histogram global rank must equal the
  * single-partition row_number() window (the definitionally-correct
  * but unscalable form) for any data distribution and partitioning,
  * and snake sharding must deal ranks boustrophedon. */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def referenceRank(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy { case (id, v) => (-v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

  test("globalRank equals the single-partition window rank (property)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      // small value range on purpose: heavy ties exercise the
      // within-value windows; unique ids keep the order total
      vs <- Gen.listOfN(n, Gen.choose(0L, 7L))
      parts <- Gen.choose(1, 7)
    } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, parts)
    (0 until 20).foreach { i =>
      val (rows, parts) = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val df = rows.toDF("id", "v").repartition(parts)
      val got = Ranking.globalRank(df, col("v"), col("id"))
        .select("id", "rn").as[(Long, Long)].collect().toMap
      val want = referenceRank(rows)
      assert(got === want, s"seed $i")
    }
  }

  test("globalPrefixMass equals the brute-force inclusive cumulative (property)") {
    val gen = for {
      n <- Gen.choose(1, 50)
      vs <- Gen.listOfN(n, Gen.choose(0L, 6L))   // ties on purpose
      ms <- Gen.listOfN(n, Gen.choose(0L, 99L))  // mass ≠ value
      parts <- Gen.choose(1, 6)
    } yield (vs.zip(ms).zipWithIndex.map { case ((v, m), i) =>
      (i.toLong, v, m) }, parts)
    (0 until 15).foreach { i =>
      val (rows, parts) = gen.apply(Gen.Parameters.default, Seed(100L + i)).get
      val df = rows.toDF("id", "v", "m").repartition(parts)
      val got = Ranking.globalPrefixMass(df, col("v"), col("id"),
          col("m").cast("decimal(18,6)"))
        .select(col("id"), col("prefix").cast("double"))
        .as[(Long, Double)].collect().toMap
      // Reference: sort by (v desc, id asc), running inclusive sum.
      var acc = 0.0
      val want = rows.sortBy { case (id, v, _) => (-v, id) }
        .map { case (id, _, m) => acc += m; id -> acc }.toMap
      assert(got.keySet == want.keySet, s"seed $i ids")
      for ((id, w) <- want)
        assert(math.abs(got(id) - w) < 1e-6, s"seed $i id=$id ${got(id)} != $w")
    }
  }

  test("globalPrefixMass has no corpus-sized single-partition window") {
    val df = (1L to 200L).map(i => (i, i % 9, i % 13)).toDF("id", "v", "m")
    val p = Ranking.globalPrefixMass(df, col("v"), col("id"),
      col("m").cast("decimal(18,6)")).queryExecution.executedPlan.toString
    // The only unpartitioned window runs over the 9-value histogram;
    // per-row windows partition by the value column.
    assert(p.contains("windowspecdefinition(__pm_v"),
      s"per-row running sums must partition by value:\n$p")
  }

  test("globalRank ascending order ranks smallest value first") {
    val df = Seq((1L, 30L), (2L, 10L), (3L, 20L)).toDF("id", "v")
    val got = Ranking.globalRank(df, col("v"), col("id"),
        valueAscending = true)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("snakeShards deals rank r to the boustrophedon shard") {
    val k = 4
    val df = (0L until 20L).map(i => (i, 1000L - i)).toDF("id", "v")
    val got = Ranking.snakeShards(df, k, col("v"), col("id"))
      .select("rn", "shard").as[(Long, Long)].collect().toMap
    got.foreach { case (rn, shard) =>
      val m = (rn - 1) % (2 * k)
      val want = if (m < k) m else 2 * k - 1 - m
      assert(shard === want.toLong, s"rank $rn")
    }
    // per-shard counts equal when n is a multiple of 2k
    val sizes = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.toSet === Set(5))
  }

  test("snakeShards balances skewed sizes better than round-robin") {
    // Pathological size distribution: one huge doc + many small.
    val rows = (0L until 40L).map(i =>
      (i, if (i == 0) 10000L else 10L + i))
    val df = rows.toDF("id", "v")
    val byShard = Ranking.snakeShards(df, 4, col("v"), col("id"))
      .groupBy("shard").agg(sum("v").as("tot"))
      .as[(Long, Long)].collect().toMap
    // the non-huge shards must be within one max-item of each other
    val rest = byShard.filterNot(_._2 > 5000L).values
    assert(rest.max - rest.min <= 50L,
      s"shard totals too spread: $byShard")
  }

  test("NULL rank values fail loudly instead of silently dropping rows") {
    // The histogram equi-join would never match a NULL value — before
    // the guard, such rows simply vanished from the output. Now the
    // first NULL fails the job with an explanatory message.
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "v")
    val e = intercept[Exception] {
      Ranking.globalRank(withNull, col("v"), col("id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("NULL rank value")),
      s"expected the loud NULL guard, got: $e")
    val e2 = intercept[Exception] {
      Ranking.globalPrefixMass(withNull, col("v"), col("id"),
        col("v").cast("decimal(38,6)")).collect()
    }
    assert(messages(e2).exists(_.contains("NULL rank value")))
    // Non-null inputs are unaffected.
    val ok = Ranking.globalRank(withNull.filter(col("v").isNotNull),
      col("v"), col("id")).select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(1L -> 1L, 3L -> 2L))
  }

  test("globalRank has no single-partition corpus-sized window") {
    // The contract that makes this operator 100 TB-credible: the only
    // unpartitioned window runs over the VALUE HISTOGRAM. A
    // single-partition Window over the input would plan as one
    // Exchange SinglePartition feeding a Window whose child carries
    // the corpus rows; here the SinglePartition exchange must sit
    // above the histogram aggregate (its output schema carries the
    // __rk columns, not the input's id column).
    val df = (0L until 100L).map(i => (i, i % 5)).toDF("id", "v")
    val plan = Ranking.globalRank(df, col("v"), col("id"))
      .queryExecution.executedPlan.toString
    val single = plan.linesIterator
      .filter(_.contains("SinglePartition")).toSeq
    assert(single.nonEmpty, "expected the histogram-offset window")
    assert(!single.exists(_.contains("[id")),
      s"corpus rows entered a single-partition exchange:\n$plan")
  }

  test("rrfFuse: exact integer RRF, both-lists ids outrank single-list ids") {
    import spark.implicits._
    // dense ranks: ids 1..4; sparse ranks: 3,4,5,6 — 3 and 4 in both
    val dense = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "rank")
    val sparse = Seq((3L, 1), (4L, 2), (5L, 3), (6L, 4)).toDF("id", "rank")
    val got = Ranking.rrfFuse(Seq(dense, sparse), "id", "rank", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def t(r: Int) = 1000000000L / (60 + r)
    val want = Map(
      1L -> (1L, t(1)), 2L -> (1L, t(2)),
      3L -> (2L, t(3) + t(1)), 4L -> (2L, t(4) + t(2)),
      5L -> (1L, t(3)), 6L -> (1L, t(4)))
    got.foreach { case (id, n, s) => assert((n, s) == want(id), s"id $id") }
    // fusion order: both-lists ids first, then by best single rank
    assert(got.map(_._1).toSeq == Seq(3L, 4L, 1L, 2L, 5L, 6L))
  }
}
