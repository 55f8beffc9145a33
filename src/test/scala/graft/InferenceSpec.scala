package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._
import graft.functions.Inference

/** Type-inference vectors (FIXTURES.md §B.4; reference main.py:165-202)
  * plus property tests (SURVEY.md §5.3 — plain ScalaCheck generators,
  * sampled deterministically; scalatestplus isn't in the offline cache). */
class InferenceSpec extends AnyFunSuite {

  private def sampled[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  private lazy val spark = SparkTestBase.spark

  private val vectors: Seq[(String, String)] = Seq(
    "1234" -> "number", "-12.5" -> "number", "$1,000" -> "number",
    "45%" -> "number",
    "2024-01-15" -> "date", "1/15/24" -> "date",
    "January 15, 2024" -> "date",
    "KDC-54" -> "categorical", "INV-001" -> "categorical",
    "ABC123" -> "categorical",
    "Active" -> "categorical", "Type A" -> "categorical",
    ("x" * 40) -> "string", "" -> "string", "N/A" -> "string",
    "---" -> "string")

  test("inferType (driver-side) matches reference vectors (B.4)") {
    vectors.foreach { case (in, exp) =>
      assert(Inference.inferType(in) == exp, s"input <$in>")
    }
    assert(Inference.inferType(null) == "string")
  }

  test("inferTypeCol (distributed) agrees with inferType on vectors") {
    import spark.implicits._
    val got = vectors.map(_._1).toDF("v")
      .select(Inference.inferTypeCol(col("v")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == vectors.map(_._2))
  }

  test("inferType is total and closed over the 4-type set (property)") {
    sampled(Gen.asciiPrintableStr, 500).foreach { s =>
      assert(Inference.Types.contains(Inference.inferType(s)), s"input <$s>")
    }
  }

  test("inferTypeCol agrees with inferType on random ascii (property)") {
    import spark.implicits._
    val samples = sampled(Gen.asciiPrintableStr, 300)
      .filter(_.forall(c => c >= ' ' && c < 127))
    val got = samples.toDF("v")
      .select(Inference.inferTypeCol(col("v")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == samples.map(Inference.inferType))
  }

  test("physicalType mapping (O10)") {
    assert(Inference.physicalType("number") == DoubleType)
    assert(Inference.physicalType("date") == DateType)
    assert(Inference.physicalType("categorical") == StringType)
    assert(Inference.physicalType("string") == StringType)
  }

  test("inferSchema: system columns + sanitized typed kpi columns") {
    val sch = Inference.inferSchema(Map(
      "Total Revenue ($)" -> "$1,234.56",
      "Report Date" -> "2024-01-15",
      "Status" -> "Active"))
    assert(sch.fieldNames.take(3).toSeq ==
      Seq("row_id", "file_name", "uploaded_at"))
    assert(sch("kpi_total_revenue____").dataType == DoubleType)
    assert(sch("kpi_report_date").dataType == DateType)
    assert(sch("kpi_status").dataType == StringType)
  }

  test("twins agree on non-ASCII values (both classify by ASCII classes)") {
    import spark.implicits._
    // Unicode letters/digits are neither [A-Za-z] nor [0-9] in the
    // distributed form — the driver twin must classify identically.
    val vectors = Seq("東京2024", "café", "١٢٣", "résumé2024")
    val colForm = vectors.toDF("v")
      .select(Inference.inferTypeCol(col("v")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(colForm == vectors.map(Inference.inferType))
  }

  test("inferSchema rejects sanitization collisions with a named error") {
    val e = intercept[IllegalArgumentException] {
      Inference.inferSchema(Map("a b" -> "x", "a_b" -> "y"))
    }
    assert(e.getMessage.contains("kpi_a_b"))
  }

  // ---- O8 batched hook (main.py:90-162 semantics) ----

  private val hookSamples = Map(
    "Revenue" -> "$1,234", "When" -> "2024-01-15", "Code" -> "KDC-54")

  test("batched hook: default regex hook gives per-column inferType parity") {
    assert(Inference.inferTypes(hookSamples) ==
      hookSamples.map { case (k, v) => k -> Inference.inferType(v) })
  }

  test("batched hook: closed-set validation — invalid types become string") {
    val hook = new Inference.TypeInferenceHook {
      override def inferTypes(s: Map[String, String]) = Map(
        "Revenue" -> "NUMBER",      // case-normalized, valid
        "When" -> "timestamp",      // not in the closed set → string
        "Code" -> "categorical")
    }
    assert(Inference.inferTypes(hookSamples, hook) == Map(
      "Revenue" -> "number", "When" -> "string", "Code" -> "categorical"))
  }

  test("batched hook: unanswered columns fall back to the regex classifier") {
    val hook = new Inference.TypeInferenceHook {
      override def inferTypes(s: Map[String, String]) = Map("Revenue" -> "number")
    }
    val got = Inference.inferTypes(hookSamples, hook)
    assert(got("Revenue") == "number")
    assert(got("When") == Inference.inferType("2024-01-15"))
    assert(got("Code") == Inference.inferType("KDC-54"))
  }

  test("batched hook: a throwing hook degrades to full regex parity") {
    val hook = new Inference.TypeInferenceHook {
      override def inferTypes(s: Map[String, String]) =
        throw new RuntimeException("llm down")
    }
    assert(Inference.inferTypes(hookSamples, hook) ==
      Inference.inferTypes(hookSamples))
  }

  test("batched hook: the hook is called exactly once for all columns") {
    var calls = 0
    val hook = new Inference.TypeInferenceHook {
      override def inferTypes(s: Map[String, String]) = {
        calls += 1; assert(s == hookSamples)
        s.map { case (k, _) => k -> "string" }
      }
    }
    Inference.inferTypes(hookSamples, hook)
    assert(calls == 1)
    // and inferSchema routes through the same single batched call
    calls = 0
    Inference.inferSchema(hookSamples, hook)
    assert(calls == 1)
  }
}
