package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Clean

/** Unit vectors for the cleaning functions, derived from the reference's
  * value pipeline (FIXTURES.md §B.2-B.5; reference main.py:224-247,
  * 262-263, 617, 632). */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def runStr(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                     inputs: Seq[String]): Seq[Any] = {
    val rows = inputs.toDF("v").select(fn(col("v")).as("r")).collect()
    rows.map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq
  }

  test("parseMessyNumber: currency / separators / percent (B.2)") {
    val got = runStr(Clean.parseMessyNumber,
      Seq("$1,234.56", "€2 000", "£3,000", "¥500", "85%", "1234", "-12.5"))
    assert(got == Seq(1234.56, 2000.0, 3000.0, 500.0, 85.0, 1234.0, -12.5))
  }

  test("parseMessyNumber: parenthesized negatives (B.2)") {
    val got = runStr(Clean.parseMessyNumber, Seq("(100)", "($1,500.25)"))
    assert(got == Seq(-100.0, -1500.25))
  }

  test("parseMessyNumber: unparseable and sentinels → NULL (B.2)") {
    val got = runStr(Clean.parseMessyNumber,
      Seq("abc", "N/A", "---", "", "12a", "(abc)", null))
    assert(got.forall(_ == null))
  }

  test("parseMessyNumber: paren around an already-signed value → NULL (reference float('--x'))") {
    // "(−42)" deparenthesizes to the string "--42", which the
    // reference's float() rejects — NOT -(-42). Pins the oracle's
    // string-prefix semantics too.
    val got = runStr(Clean.parseMessyNumber, Seq("(-42)", "(+7)", "(inf)"))
    assert(got.forall(_ == null))
  }

  test("parseFuzzyDate: declared format subset (B.3)") {
    val got = runStr(Clean.parseFuzzyDate,
      Seq("2024-01-15", "2024/1/5", "01/15/2024", "January 15, 2024",
        "Jan 15 2024", "not a date", "N/A"))
    val exp = Seq("2024-01-15", "2024-01-05", "2024-01-15", "2024-01-15",
      "2024-01-15", null, null)
    assert(got.map(Option(_).map(_.toString).orNull) == exp)
  }

  test("parseFuzzyDate: round-5 tail formats (dd-Mon-yyyy, month-first no comma)") {
    val got = runStr(Clean.parseFuzzyDate,
      Seq("15-Jan-2024", "5-Jan-2024", "15-January-2024", "5-May-2024",
        "January 15 2024", "January 5 2024", "15-Notamonth-2024"))
    val exp = Seq("2024-01-15", "2024-01-05", "2024-01-15", "2024-05-05",
      "2024-01-15", "2024-01-05", null)
    assert(got.map(Option(_).map(_.toString).orNull) == exp)
  }

  test("parseFuzzyDate: round-10 tail (d-MMM-yy POSIX pivot, yyyyMMdd)") {
    val got = runStr(Clean.parseFuzzyDate,
      Seq("05-Mar-98", "5-Mar-69", "05-Mar-68", "05-Mar-01", "5-Mar-00",
        "19980305", "20240115", "99999999", "05-Mar-9"))
    // POSIX two-digit-year pivot: 69..99 -> 19xx, 00..68 -> 20xx
    val exp = Seq("1998-03-05", "1969-03-05", "2068-03-05", "2001-03-05",
      "2000-03-05", "1998-03-05", "2024-01-15", null, null)
    assert(got.map(Option(_).map(_.toString).orNull) == exp)
  }

  test("parseFuzzyDate: round-6 tail (abbrev month with comma, ordinal suffixes)") {
    val got = runStr(Clean.parseFuzzyDate,
      Seq("Jan 5, 2024", "Jan 15, 2024", "Sep 5, 2024",
        "3rd March 2021", "1st May 2021", "22nd January 2021",
        "March 3rd, 2021", "May 1st, 2021", "January 22nd, 2021",
        "4th July 2021", "12th August 2021",
        // Suffix without a date around it must stay unparseable, and a
        // mid-word 'st' must not be stripped ("1study" is not "1udy").
        "3rd place 2021", "1study"))
    val exp = Seq("2024-01-05", "2024-01-15", "2024-09-05",
      "2021-03-03", "2021-05-01", "2021-01-22",
      "2021-03-03", "2021-05-01", "2021-01-22",
      "2021-07-04", "2021-08-12",
      null, null)
    assert(got.map(Option(_).map(_.toString).orNull) == exp)
  }

  test("nullNormalize: sentinels → NULL, others pass through (B.2)") {
    val got = runStr(Clean.nullNormalize, Seq("", "N/A", "---", "ok", null))
    assert(got == Seq(null, null, null, "ok", null))
  }

  test("sanitizeIdent / sanitizeFilename / sanitizeEmail (B.5)") {
    assert(runStr(Clean.sanitizeIdent, Seq("Total Revenue ($)")) ==
      Seq("total_revenue____"))
    assert(runStr(Clean.sanitizeFilename, Seq("Q1-Report.pdf", "a b?c.pdf")) ==
      Seq("Q1-Report.pdf", "a_b_c.pdf"))
    assert(runStr(Clean.sanitizeEmail, Seq("user@mail.com")) ==
      Seq("user_mail_com"))
  }

  test("stripJsonFences (O6)") {
    val got = runStr(Clean.stripJsonFences,
      Seq("```json\n{\"a\":1}\n```", "```\n{}\n```", "{\"b\":2}"))
    assert(got == Seq("{\"a\":1}", "{}", "{\"b\":2}"))
  }
}
