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
    // ASCII classes, NOT Char.isLetter/isDigit: the distributed twin
    // rlikes [A-Za-z]/[0-9] (as the reference's re.search does,
    // main.py:177-178), and the two classifiers must agree on every
    // input — Unicode letters/digits classify as neither.
    val hasAlpha = s.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
    val hasDigit = s.exists(c => c >= '0' && c <= '9')
    if (hasAlpha && hasDigit) {
      if (s.matches(MonthNameDateRe)) "date"
      else if (s.length <= 30) "categorical"
      else "string"
    } else if (s.matches(PureDateRe)) "date"
    else if (s.length <= 30 && s.matches(AlphaRe)) "categorical"
    else "string"
  }

  /** O8 hook (reference main.py:90-162): ONE call carrying ALL
    * `{column name → sample value}` pairs — the reference batches every
    * column into a single LLM request rather than one call per column.
    * Implementations may throw (network, parse); [[inferTypes]] applies
    * the closed-set validation and per-column fallback around the call,
    * so a hook never needs its own error handling. The default
    * [[RegexTypeInference]] is the deterministic classifier — drop an
    * LLM-backed implementation in without touching the pipeline. */
  trait TypeInferenceHook extends Serializable {
    def inferTypes(samples: Map[String, String]): Map[String, String]
  }

  /** Default hook: the regex classifier applied per column (the
    * reference's fallback path, main.py:165-202). */
  object RegexTypeInference extends TypeInferenceHook {
    override def inferTypes(samples: Map[String, String]): Map[String, String] =
      samples.map { case (name, sample) => name -> inferType(sample) }
  }

  /** O8 batched inference with the reference's guardrails
    * (main.py:147-162): the hook is called ONCE with all pairs; each
    * returned type is lower-cased and validated against the closed set
    * {number,date,categorical,string} — a present-but-invalid type
    * degrades to "string" (main.py:152-155); a column the hook did not
    * answer for, or a hook that throws entirely, falls back to the
    * deterministic regex classifier per column. The result always has
    * exactly the input's keys. */
  def inferTypes(samples: Map[String, String],
                 hook: TypeInferenceHook = RegexTypeInference): Map[String, String] = {
    val answered =
      try hook.inferTypes(samples)
      catch { case _: Exception => Map.empty[String, String] }
    samples.map { case (name, sample) =>
      name -> (answered.get(name) match {
        case Some(t) if Types.contains(t.toLowerCase) => t.toLowerCase
        case Some(_)                                  => "string"
        case None                                     => inferType(sample)
      })
    }
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
    * (main.py:297-301). Types come from ONE [[inferTypes]] hook call
    * over all samples (main.py:482-483's all-columns batch) — at
    * 100 TB this stays a driver-side O(#columns) step, never a
    * data-sized job. */
  def inferSchema(samples: Map[String, String],
                  hook: TypeInferenceHook = RegexTypeInference): StructType = {
    val sys = Seq(
      StructField("row_id", StringType, nullable = false),
      StructField("file_name", StringType),
      StructField("uploaded_at", TimestampType))
    val types = inferTypes(samples, hook)
    val kpis = samples.toSeq.sortBy(_._1).map { case (name, _) =>
      StructField("kpi_" + name.replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase,
        physicalType(types(name)))
    }
    // Distinct raw names can sanitize to one column ("a b" and "a_b"
    // both → kpi_a_b); a schema with duplicate fields poisons every
    // later lookup — fail at discovery time with the colliding names.
    val dup = kpis.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
    require(dup.isEmpty,
      s"column name collision after sanitization: ${dup.mkString(", ")} — rename the source fields")
    StructType(sys ++ kpis)
  }

  /** Classify every value of `col` in `df` — distributed, returns the
    * per-type histogram (the shape of declared query q_infer_type). */
  def typeHistogram(df: DataFrame, col: String): DataFrame =
    df.select(inferTypeCol(df(col)).as("inferred"))
      .groupBy("inferred").count()
}
