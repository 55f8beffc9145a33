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

  test("pdf_text and media_dims run as native SQL over binary payloads") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, graft.operators.PdfCodec.encode(
        Seq(Seq("hello from (a) PDF")), compress = true)),
      (2L, graft.operators.Multimodal.ImageHeaders.png(640, 480)),
      (3L, "just text".getBytes("UTF-8")))
      .toDF("id", "content")
    rows.createOrReplaceTempView("uploads")
    val out = spark.sql("""
      SELECT id, pdf_text(content) AS txt,
             media_dims(content).format AS fmt,
             media_dims(content).width AS w
      FROM uploads ORDER BY id""").collect()
    assert(out(0).getString(1) == "hello from (a) PDF" && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getString(2) == "image/png" &&
      out(1).getInt(3) == 640)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    // Type errors are analysis-time, not runtime.
    val e = intercept[Exception] { spark.sql("SELECT pdf_text('s')").collect() }
    assert(e.getMessage.contains("BINARY") ||
      e.getMessage.contains("pdf_text"))
    // And Y4M headers sniff through media_dims.
    val y4m = graft.operators.Y4mCodec.encode(graft.operators.Y4mCodec.Video(
      8, 6, 25, 1, "C444", Seq(Array.fill[Byte](144)(0))))
    val vy = Seq((9L, y4m)).toDF("id", "content")
    vy.createOrReplaceTempView("vids")
    val rv = spark.sql(
      "SELECT media_dims(content).format, media_dims(content).height " +
        "FROM vids").first()
    assert(rv.getString(0) == "video/y4m" && rv.getInt(1) == 6)
  }
}
