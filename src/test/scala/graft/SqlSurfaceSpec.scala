package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Queries
import graft.plans.GraftFunctions

/** The engine's SQL surface: the same queries are expressible through
  * spark.sql over registered views (plus the graft native functions),
  * and produce results identical to the DataFrame programs. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def register(): Unit =
    Seq("lineitem", "orders", "customer", "supplier", "nation", "documents")
      .foreach { t =>
        spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      }

  test("TPC-H Q1 shape via spark.sql equals the DataFrame program") {
    register()
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""").collect()
    val df = Queries.queries("q_agg_group")(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
    assert(sql.map(_.toString).toSeq == df.map(_.toString).toSeq)
  }

  test("broadcast-join query via spark.sql with hint equals DataFrame") {
    register()
    val sql = spark.sql("""
      SELECT /*+ BROADCAST(supplier), BROADCAST(nation) */
        n_name, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""").collect()
    val df = Queries.queries("q_join_broadcast")(spark, dir).collect()
    assert(sql.map(_.toString).toSeq == df.map(_.toString).toSeq)
  }

  test("native functions compose with SQL over views") {
    register()
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT count(*) AS n
      FROM documents
      WHERE parse_messy_number(CAST(n_chars AS STRING)) = CAST(n_chars AS DOUBLE)
    """).first()
    val total = spark.table("documents").count()
    assert(r.getLong(0) == total)
  }
}
