package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.TableIO

/** Round-trip contract for every supported format. */
class TableIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("at", TimestampType)))

  private val rows = Seq(
    Row(1L, "alpha", 1.5, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
    Row(2L, "beta,with,commas", -2.25,
      java.sql.Timestamp.valueOf("2024-02-02 20:30:00")),
    Row(3L, null, null, null))

  test("flat schema round-trips losslessly through all four formats") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    TableIO.Formats.foreach { fmt =>
      assert(TableIO.roundTripSafe(schema, fmt), fmt)
      val dir = Files.createTempDirectory(s"graft-io-$fmt").toString
      TableIO.write(df, dir, fmt)
      val back = TableIO.read(spark, dir, fmt, schema)
        .orderBy("id").collect()
      assert(back.length == rows.length, fmt)
      rows.sortBy(r => r.getAs[Long](0)).zip(back).foreach { case (exp, got) =>
        assert(exp == got, s"$fmt: $exp != $got")
      }
    }
  }

  test("columnar formats self-describe") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    Seq("parquet", "orc").foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-io2-$fmt").toString
      TableIO.write(df, dir, fmt)
      val back = TableIO.readColumnar(spark, dir, fmt)
      assert(back.schema == schema, fmt)
      assert(back.count() == rows.length)
    }
    intercept[IllegalArgumentException] {
      TableIO.readColumnar(spark, "/tmp/x", "csv")
    }
  }

  test("roundTripSafe rejects nested/binary where the format loses them") {
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType))))
    val withBinary = StructType(Seq(StructField("b", BinaryType)))
    assert(!TableIO.roundTripSafe(nested, "csv"))
    assert(TableIO.roundTripSafe(nested, "json"))
    assert(TableIO.roundTripSafe(nested, "parquet"))
    assert(!TableIO.roundTripSafe(withBinary, "json"))
    assert(!TableIO.roundTripSafe(withBinary, "csv"))
    assert(TableIO.roundTripSafe(withBinary, "orc"))
  }
}
