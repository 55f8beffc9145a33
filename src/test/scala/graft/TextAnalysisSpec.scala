package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextAnalysis

/** Text-analysis unit tests beyond the oracle queries: the scalar
  * Column form and the scalable DataFrame form of language-ID must
  * agree, and the scoring primitives behave on constructed inputs. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("langId Column form agrees with withLangPred DataFrame form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scalar = docs.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vectorized = TextAnalysis.withLangPred(docs, "text", Seq("doc_id"))
      .select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scalar == vectorized)
  }

  test("withLangPred keeps zero-token rows (NULL text → 'und'), never drops them") {
    val docs = Seq((1L, "the cat and the dog"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.withLangPred(docs, "text", Seq("doc_id"))
      .select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 3, "every input row must survive")
    assert(got(1L) == "en")
    assert(got(2L) == "und" && got(3L) == "und")
  }

  test("langId picks the marker-dominant language, 'und' when none") {
    val got = Seq(
      "the cat and the dog of a house",
      "der hund und das haus ist hier",
      "le chat et les maisons du village",
      "xyz qqq www zzz")
      .toDF("text")
      .select(TextAnalysis.langId(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma")
      .toDF("text")
      .select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getLong(0)).toSeq
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1), "permuted tokens must fingerprint differently")
  }

  test("redactPii replaces emails/IPs/phones, leaves look-alikes alone") {
    val rows = Seq(
      "mail a.b+c@sub.example.co.uk now",          // email, multi-label domain
      "server at 192.168.0.1 and 10.0.0.255",      // two IPs
      "call +1 (555) 867-5309 today",              // phone
      "version 1.2.3 costs $1,234 at 50% off",     // NOT PII: short dots, money
      "user@localhost is not an email",            // no TLD -> keep
      "a@b.io and 8.8.8.8 and +44 (020) 555-0199") // all three in one doc
      .toDF("text").select(TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(rows(0) == "mail <EMAIL> now")
    assert(rows(1) == "server at <IP> and <IP>")
    assert(rows(2) == "call <PHONE> today")
    assert(rows(3) == "version 1.2.3 costs $1,234 at 50% off",
      "semver/money must survive redaction")
    assert(rows(4) == "user@localhost is not an email")
    assert(rows(5) == "<EMAIL> and <IP> and <PHONE>")
  }

  test("qualityScore bounded in [0,1] and monotone in stopword ratio") {
    val scores = Seq(
      "the of and to a in is the of and", // all stopwords
      "qqq www eee rrr ttt yyy uuu iii ooo ppp") // none
      .toDF("text")
      .select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0)).toSeq
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }
}
