package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Queries

/** Smoke: every declared query executes on sf0.001 and returns rows
  * (except q_join_anti, legitimately empty at tiny SF — every customer
  * has orders there). Exact result parity vs DuckDB is the driver's
  * job (tools/check_oracle.py locally). */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  // q_join_anti: every sf0.001 customer has orders; q_embed_near_dup:
  // the 1-in-5 sample at sf0.001 has no cosine>=0.4 pair.
  private val mayBeEmpty = Set("q_join_anti", "q_embed_near_dup")

  Queries.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val n = q.fn(spark, dir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx quantiles stay within sketch error of exact quantiles") {
    def qs(name: String) = Queries.queries(name)(spark, dir).collect()
      .map(r => r.getString(0) -> Seq(1, 2, 3).map(r.getDouble)).toMap
    val exact = qs("q_quantile")
    val approx = qs("q_approx_quantile")
    exact.foreach { case (flag, qs) =>
      qs.zip(approx(flag)).foreach { case (e, a) =>
        assert(math.abs(e - a) <= math.max(1.0, e * 0.1),
          s"group $flag: exact $e vs approx $a")
      }
    }
  }

  test("every oracleSql key has a matching queries entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
