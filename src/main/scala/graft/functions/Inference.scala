package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sample-based logical type inference, re-expressing the reference's
  * deterministic regex classifier (reference main.py:165-202, the
  * fallback for the batched LLM call at main.py:90-162) and the
  * logical→physical map (main.py:208-216).
  *
  * Two forms:
  *  - [[inferTypeCol]]: a pure Column expression (codegen'd CASE WHEN
  *    chain) usable inside distributed plans;
  *  - [[inferSchema]]: driver-side schema discovery over ≤1 sample per
  *    column, mirroring how the reference batches ALL samples into one
  *    classification pass (main.py:482-483) — at 100 TB this stays a
  *    driver-side O(#columns) step, never a data-sized job.
  */
object Inference {

  val Types = Seq("number", "date", "categorical", "string")

  private val MessyChars = "[$€£¥,\\s%]"
  private val NumericRe = "^-?\\d+(\\.\\d+)?$"
  /** `Month DD, YYYY` (main.py:183-185). */
  private val MonthNameDateRe = "^[A-Za-z]+ \\d{1,2},? \\d{4}$"
  /** Pure digit/sep date patterns (main.py:189-196). */
  private val PureDateRe =
    "^(\\d{4}[-/]\\d{1,2}[-/]\\d{1,2}|\\d{1,2}[-/]\\d{1,2}[-/]\\d{2,4})$"
  /** Short alphabetic → categorical (main.py:199-200). */
  private val AlphaRe = "^[A-Za-z][A-Za-z .-]*$"

  /** O9 as a single codegen'd CASE WHEN chain; branch order follows
    * main.py:165-202 exactly. */
  def inferTypeCol(c: Column): Column = {
    val s = trim(c)
    val cleaned = regexp_replace(s, MessyChars, "")
    when(c.isNull || s.isin("", "N/A", "---"), lit("string"))
      .when(cleaned.rlike(NumericRe), lit("number"))
      .when(s.rlike("[A-Za-z]") && s.rlike("[0-9]"),
        when(s.rlike(MonthNameDateRe), lit("date"))
          .when(length(s) <= 30, lit("categorical"))
          .otherwise(lit("string")))
      .when(s.rlike(PureDateRe), lit("date"))
      .when(length(s) <= 30 && s.rlike(AlphaRe), lit("categorical"))
      .otherwise(lit("string"))
  }

  /** Plain-Scala twin of [[inferTypeCol]] for driver-side use and
    * property tests; total (never throws). */
  def inferType(v: String): String = {
    if (v == null) return "string"
    val s = v.trim
    if (s.isEmpty || s == "N/A" || s == "---") return "string"
    val cleaned = s.replaceAll(MessyChars, "")
    if (cleaned.matches(NumericRe)) return "number"
    val hasAlpha = s.exists(_.isLetter)
    val hasDigit = s.exists(_.isDigit)
    if (hasAlpha && hasDigit) {
      if (s.matches(MonthNameDateRe)) "date"
      else if (s.length <= 30) "categorical"
      else "string"
    } else if (s.matches(PureDateRe)) "date"
    else if (s.length <= 30 && s.matches(AlphaRe)) "categorical"
    else "string"
  }

  /** O10: logical → Spark physical type (main.py:208-216 mapped from
    * BigQuery FLOAT64/DATE/STRING). */
  def physicalType(logical: String): DataType = logical match {
    case "number" => DoubleType
    case "date"   => DateType
    case _        => StringType
  }

  /** Driver-side schema discovery: one sample value per column name →
    * typed StructType, with the reference's system columns prepended
    * (main.py:297-301). */
  def inferSchema(samples: Map[String, String]): StructType = {
    val sys = Seq(
      StructField("row_id", StringType, nullable = false),
      StructField("file_name", StringType),
      StructField("uploaded_at", TimestampType))
    val kpis = samples.toSeq.sortBy(_._1).map { case (name, sample) =>
      StructField("kpi_" + name.replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase,
        physicalType(inferType(sample)))
    }
    StructType(sys ++ kpis)
  }

  /** Classify every value of `col` in `df` — distributed, returns the
    * per-type histogram (the shape of declared query q_infer_type). */
  def typeHistogram(df: DataFrame, col: String): DataFrame =
    df.select(inferTypeCol(df(col)).as("inferred"))
      .groupBy("inferred").count()
}
