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

  test("rangeJoin result has no duplicate pairs from multi-bucket spans") {
    val left = Seq((1L, 1L, ts(0), ts(600))).toDF("lid", "k", "start", "end")
    val right = Seq((1L, 2L, ts(300))).toDF("k", "rid", "rt")
    val rows = TemporalJoins.rangeJoin(left, right, Seq("k"),
      "start", "end", "rt", bucketSeconds = 60L).collect()
    assert(rows.length == 1, s"right point must land in exactly one bucket: ${rows.length}")
  }
}
