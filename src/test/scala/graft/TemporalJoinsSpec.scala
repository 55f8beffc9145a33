package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins

/** Edge cases for the composed as-of / range joins. */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp(1704067200000L + min * 60000L)

  test("asofJoin: latest at-or-before, inclusive tie, null when no prior") {
    val left = Seq((1L, 10L, ts(10)), (2L, 10L, ts(30)), (3L, 20L, ts(5)))
      .toDF("id", "k", "t")
    val right = Seq(
      (10L, ts(10), "exact-tie"), (10L, ts(25), "latest-for-30"),
      (10L, ts(40), "future-ignored"), (30L, ts(0), "other-key"))
      .toDF("k", "t", "tag")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t", Seq("tag"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3)))
    // inclusive: the ts(10) right row matches the ts(10) left row
    assert(got(0) == (1L, "exact-tie"))
    assert(got(1) == (2L, "latest-for-30"))
    assert(got(2) == (3L, null)) // key 20 has no right rows at all
  }

  test("asofJoin plans one shuffle, no join explosion") {
    val left = Seq((1L, 10L, ts(10))).toDF("id", "k", "t")
    val right = Seq((10L, ts(5), "x")).toDF("k", "t", "tag")
    val plan = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan)
    assert(plan.contains("Window"), plan)
  }

  test("rangeJoin: inclusive bounds, bucket-boundary spanning, key isolation") {
    // window [t-120min, t]; bucket = 1 hour → intervals span 3 buckets
    val left = Seq((100L, 1L, ts(0), ts(120)), (200L, 2L, ts(0), ts(120)))
      .toDF("lid", "k", "start", "end")
    val right = Seq(
      (1L, 300L, ts(0)),    // at start bound (inclusive)
      (1L, 301L, ts(61)),   // mid, different bucket than start
      (1L, 302L, ts(120)),  // at end bound (inclusive)
      (1L, 303L, ts(121)),  // just outside
      (2L, 304L, ts(60)),   // other key → only lid 200
      (3L, 305L, ts(60)))   // key not on left
      .toDF("k", "rid", "rt")
    val got = TemporalJoins.rangeJoin(left, right, Seq("k"),
        "start", "end", "rt", bucketSeconds = 3600L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 300L), (100L, 301L), (100L, 302L), (200L, 304L)))
  }

  test("asofJoin matches a brute-force reference on random data (property)") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, ts(rnd.nextInt(500))))
    val right = (1 to 300).map(i =>
      ((rnd.nextInt(8) + 1).toLong, ts(rnd.nextInt(500)), s"tag$i"))
    val got = TemporalJoins.asofJoin(
        left.toDF("id", "k", "t"), right.toDF("k", "t", "tag"),
        Seq("k"), "t", "t", Seq("tag"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    // Brute force: for each left row, the right row with max time <= t
    // (ties on time broken by input order's last — mirror the window's
    // last() over ties, which takes the later of equal-time rows).
    left.foreach { case (id, k, t) =>
      val cands = right.filter(r => r._1 == k && !r._2.after(t))
      val exp = if (cands.isEmpty) null
        else cands.maxBy(r => (r._2.getTime, right.indexOf(r)))._3
      val g = got(id)
      // equal-time ties are order-ambiguous both in the operator and
      // brute force — only compare when the winning time is unique
      val winners = cands.filter(c => cands.forall(!_._2.after(c._2)))
      if (winners.map(_._2.getTime).distinct.size <= 1 && winners.size <= 1)
        assert(g == exp, s"left $id key $k: got $g expected $exp")
      else assert(winners.map(_._3).contains(g), s"left $id: $g not among ties")
    }
  }

  test("rangeJoin matches a brute-force reference on random data (property)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      { val s = rnd.nextInt(400); (i.toLong, (rnd.nextInt(5) + 1).toLong,
        ts(s), ts(s + rnd.nextInt(90))) })
    val right = (1 to 200).map(i =>
      ((rnd.nextInt(5) + 1).toLong, (1000 + i).toLong, ts(rnd.nextInt(500))))
    val got = TemporalJoins.rangeJoin(
        left.toDF("lid", "k", "start", "end"), right.toDF("k", "rid", "rt"),
        Seq("k"), "start", "end", "rt", bucketSeconds = 1800L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = (for {
      (lid, lk, s, e) <- left
      (rk, rid, rt) <- right
      if lk == rk && !rt.before(s) && !rt.after(e)
    } yield (lid, rid)).toSet
    assert(got == exp,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("rangeJoin result has no duplicate pairs from multi-bucket spans") {
    val left = Seq((1L, 1L, ts(0), ts(600))).toDF("lid", "k", "start", "end")
    val right = Seq((1L, 2L, ts(300))).toDF("k", "rid", "rt")
    val rows = TemporalJoins.rangeJoin(left, right, Seq("k"),
      "start", "end", "rt", bucketSeconds = 60L).collect()
    assert(rows.length == 1, s"right point must land in exactly one bucket: ${rows.length}")
  }

  test("rangeJoin guards pathological bucket fan-out with an explicit error") {
    // A year-long interval over 1-second buckets would replicate one
    // left row ~31M× — the guard must fail the job with a named error,
    // not silently explode the shuffle.
    val left = Seq((1L, 1L, ts(0), ts(60 * 24 * 365))).toDF("lid", "k", "start", "end")
    val right = Seq((1L, 2L, ts(300))).toDF("k", "rid", "rt")
    val e = intercept[Exception] {
      TemporalJoins.rangeJoin(left, right, Seq("k"),
        "start", "end", "rt", bucketSeconds = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBucketsPerInterval")),
      s"expected the guard's error, got: $e")
    // The same data passes with a sane divisor (365 day buckets)...
    val ok = TemporalJoins.rangeJoin(left, right, Seq("k"),
      "start", "end", "rt", bucketSeconds = 86400L).collect()
    assert(ok.length == 1)
    // ...or when the caller raises the guard knowingly.
    val ok2 = TemporalJoins.rangeJoin(left, right, Seq("k"),
      "start", "end", "rt", bucketSeconds = 3600L,
      maxBucketsPerInterval = 10000).collect()
    assert(ok2.length == 1)
  }

  test("overlapJoin matches a brute-force inequality join on random data (property)") {
    val rnd = new scala.util.Random(7)
    val li = (1 to 300).map { i =>
      val s = rnd.nextInt(5000); (i.toLong, (i % 9).toLong, ts(s), ts(s + rnd.nextInt(400)))
    }.toDF("lk", "k", "ls", "le")
    val ri = (1 to 300).map { i =>
      val s = rnd.nextInt(5000); (i.toLong, (i % 9).toLong, ts(s), ts(s + rnd.nextInt(400)))
    }.toDF("rk", "k", "rs", "re")
    val got = TemporalJoins.overlapJoin(li, ri, Seq("k"),
        "ls", "le", "rs", "re", bucketSeconds = 3600)
      .select("lk", "rk").collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = li.join(ri, li("k") === ri("k")
        && li("ls") <= ri("re") && ri("rs") <= li("le"))
      .select("lk", "rk").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size,
      "multi-bucket overlaps must emit exactly once (first-shared-bucket)")
    assert(got.toSet == brute.toSet,
      s"missing=${(brute.toSet -- got.toSet).take(5)} extra=${(got.toSet -- brute.toSet).take(5)}")
  }

  test("asofJoinBucketed matches asofJoin on random data (property)") {
    // Unique right times per key → the as-of winner is unambiguous, so
    // both operators must agree exactly. Small bucket span forces both
    // the in-bucket and the cross-bucket carry paths to fire. A
    // quarter of the right VALUES are null: both forms must carry the
    // last NON-NULL value per column (a null row never masks an
    // earlier non-null) — this pins the per-column carry semantics.
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, ts(rnd.nextInt(600))))
    val right = rnd.shuffle((0 until 600).toList).take(250).zipWithIndex.map {
      case (minute, i) =>
        ((i % 6 + 1).toLong, ts(minute), if (i % 4 == 0) null else s"tag$i")
    } // per (k, t) uniqueness: one right row per minute overall
    val lDf = left.toDF("id", "k", "t")
    val rDf = right.toDF("k", "t", "tag")
    val base = TemporalJoins.asofJoin(lDf, rDf, Seq("k"), "t", "t", Seq("tag"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    // 10-minute buckets: most carries cross bucket boundaries.
    val bucketed = TemporalJoins.asofJoinBucketed(lDf, rDf, Seq("k"),
        "t", "t", Seq("tag"), bucketSpanSeconds = 600L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(bucketed == base)
  }

  test("asofJoinBucketed stays correct under a single hot key") {
    // Same shape as the asofJoin skew probe: exact per-row carries must
    // hold while the window is split across (key, bucket) partitions.
    val n = 50000
    val left = spark.range(n.toLong)
      .selectExpr("id AS lid", "CAST(1 AS LONG) AS k",
        "timestamp_seconds(1704067200 + id * 10) AS t")
    val right = spark.range(5000)
      .selectExpr("CAST(1 AS LONG) AS k",
        "timestamp_seconds(1704067200 + id * 100) AS t", "id AS tag")
    val got = TemporalJoins.asofJoinBucketed(left, right, Seq("k"),
      "t", "t", Seq("tag"), bucketSpanSeconds = 3600L)
    val wrong = got.selectExpr("lid", "asof_tag")
      .where("asof_tag IS NULL OR asof_tag != CAST(lid / 10 AS LONG)")
      .count()
    assert(wrong == 0)
    assert(got.count() == n.toLong)
  }

  test("asofJoin stays correct under a single hot key (skew probe)") {
    // One key carries the whole dataset (the documented worst case for
    // the key-partitioned window): 50k left rows + 5k right rows on a
    // single key must still produce exact per-row carries.
    val n = 50000
    val left = spark.range(n.toLong)
      .selectExpr("id AS lid", "CAST(1 AS LONG) AS k",
        "timestamp_seconds(1704067200 + id * 10) AS t")
    val right = spark.range(5000)
      .selectExpr("CAST(1 AS LONG) AS k",
        "timestamp_seconds(1704067200 + id * 100) AS t", "id AS tag")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "t", Seq("tag"))
    // left row i (time 10i) carries right row floor(10i/100) = i/10
    val wrong = got.selectExpr("lid", "asof_tag")
      .where("asof_tag IS NULL OR asof_tag != CAST(lid / 10 AS LONG)")
      .count()
    assert(wrong == 0)
    assert(got.count() == n.toLong)
  }
}
