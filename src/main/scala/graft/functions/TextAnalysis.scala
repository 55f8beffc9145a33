package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID (marker-token heuristic), quality scoring, token
  * counting, and positional document fingerprinting.
  *
  * Everything here is a pure Column expression (no UDFs), deliberately
  * restricted to arithmetic that is bit-reproducible in ANSI SQL so
  * each operator carries a DuckDB oracle. At 100 TB all of these are
  * embarrassingly parallel map-side transforms — zero shuffle.
  *
  * Codegen note: [[langId]], [[qualityScore]], [[typeTokenRatio]] and
  * [[fingerprint]] use higher-order functions (filter/aggregate/
  * transform), which Spark evaluates INTERPRETED per row — acceptable
  * here because each operates on one short token array with a small
  * fixed marker list. For corpus-wide language scoring prefer
  * [[withLangPred]], which replaces the per-language filter() with
  * exploded codegen'd conditional sums (the ~10× cheaper shape at
  * scale); the same rewrite applies to qualityScore's stopword count
  * if it ever dominates a profile.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Deterministic and tiny by design: language scores are
    * exact token-match counts, the argmax (ties broken by the fixed
    * priority order below) is the prediction. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "du"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))

  /** Language prediction: argmax of marker counts, 'und' (undetermined)
    * when no marker fires; ties go to the earlier language in
    * [[LangMarkers]] order. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (l, ms) => l -> markerCount(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** DataFrame form of language-ID for corpus-scale use: the Column
    * form's per-language filter() HOFs are interpreted; this explodes
    * tokens once and counts markers with codegen'd conditional sums —
    * one shuffle on the grouping key, map-side combined. Returns the
    * input plus `lang_pred`. `keyCols` must uniquely key the rows. */
  def withLangPred(df: org.apache.spark.sql.DataFrame, textCol: String,
                   keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val key = keyCols.map(col)
    val exploded = df.select(key :+ explode(tokens(col(textCol))).as("_tok"): _*)
    val sums = LangMarkers.map { case (l, ms) =>
      sum(when(col("_tok").isin(ms.map(lit(_)): _*), 1L).otherwise(0L)).as(s"_s_$l")
    }
    val counts = exploded.groupBy(key: _*).agg(sums.head, sums.tail: _*)
    val best = greatest(LangMarkers.map { case (l, _) => col(s"_s_$l") }: _*)
    val pred = LangMarkers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(best > 0 && col(s"_s_$l") === best, lit(l)).otherwise(acc)
    }
    // LEFT join + coalesce: a NULL text explodes to zero token rows and
    // would otherwise vanish from the output entirely — the contract is
    // "input plus lang_pred", and a doc with no tokens is 'und'.
    df.join(counts.select(key :+ pred.as("lang_pred"): _*), keyCols, "left")
      .withColumn("lang_pred", coalesce(col("lang_pred"), lit("und")))
  }

  /** Word-ish tokens for the regex (BPE-ish) tokenizer: letter runs,
    * digit runs, and single other non-space symbols — the same RE2/Java
    * compatible pattern the oracle uses. */
  val TokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Number of regex tokens in the lowercased text. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(TokenRe), lit(0)))

  /** Number of whitespace tokens. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** PII patterns for [[redactPii]], engine-portable by construction:
    * no lookaround, no backrefs, greedy quantifiers over character
    * classes only — Java regex (Spark) and RE2 (DuckDB) produce the
    * same matches for this subset, so the oracle applies the identical
    * strings. The phone pattern is deliberately format-strict
    * (`+C (AAA) NNN-NNNN`): a looser digit-run pattern would redact
    * quantities and years wholesale — precision over recall for a
    * scrubber that runs BEFORE training. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+[0-9]{1,2} \\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"

  /** Replace emails, IPv4s and phone-shaped sequences with stable
    * placeholder tokens. Order matters: emails first (their local and
    * domain parts contain digit/dot runs the IP pattern would bite
    * into), phones last (their digits can't be confused once IPs are
    * gone). Pure codegen'd string ops — zero shuffle, scales as a map. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Count of matches of one [[redactPii]] pattern (group 0). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Cross-engine-stable rounding: floor(x·10^dp + 0.5)/10^dp.
    * Ratios of small integers often land EXACTLY on .xxxx5 decimal
    * boundaries, where Spark's BigDecimal HALF_UP and DuckDB's rounding
    * can disagree about which side the nearest double sits on. The
    * floor form is the same three IEEE ops in both engines, so results
    * are bit-identical; oracles MUST inline the same expression.
    * Defined for any sign: on negatives the tie behavior is
    * half-toward-+infinity (floor(-0.5 + 0.5) = 0), NOT half-away-
    * from-zero — q_unigram_logprob (negative log-probs) and
    * q_stats_agg (correlations) depend on exactly this form on both
    * sides, so do not "fix" the negative tie direction without
    * changing every oracle in lockstep. */
  def roundStable(c: Column, dp: Int): Column = {
    val scale = math.pow(10.0, dp.toDouble)
    floor(c * scale + 0.5) / scale
  }

  /** 4-dp form of [[roundStable]] (the quality/ratio convention). */
  def round4Stable(c: Column): Column = roundStable(c, 4)

  /** Type-token ratio (distinct/total whitespace tokens), 4 dp. */
  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    round4Stable(size(array_distinct(t)).cast("double") / size(t))
  }

  /** Quality score in [0,1]: linear mix of length saturation, stopword
    * ratio (en markers) and non-alphanumeric penalty. Linear arithmetic
    * + 4 dp rounding keeps Spark and DuckDB bit-identical. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val stopRatio = markerCount(t, LangMarkers.head._2).cast("double") / nTok
    val punct = length(regexp_replace(lower(text), "[a-z0-9 ]", ""))
    val punctRatio = punct.cast("double") / length(text)
    round4Stable(
      least(nTok, lit(100.0)) / 100.0 * 0.4
        + stopRatio * 0.3
        + (lit(1.0) - punctRatio) * 0.3)
  }

  /** Positional polynomial fingerprint (rolling-hash analog, kept
    * order-sensitive by the 1-based position weight, and inside exact
    * int64 range so no modular fold is needed until the end):
    * sum_i i * (ascii(first(tok_i))*31 + len(tok_i)) mod 1000003. */
  def fingerprint(text: Column): Column = {
    val t = tokens(text)
    val weighted = transform(t, (x, i) =>
      (i.cast("long") + 1L) * (ascii(substring(x, 1, 1)).cast("long") * 31L
        + length(x).cast("long")))
    aggregate(weighted, lit(0L), (a, b) => a + b) % 1000003L
  }

  /** Stopwords the Gopher-style composite filter tests for (the en
    * marker list minus the rarer members — presence, not language, is
    * the signal here). */
  val FilterStopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  /** Gopher-style composite quality gate: first failing rule (in the
    * published rule order) or NULL when the doc passes. All arithmetic
    * is INTEGER comparisons (mean-word-length bounds are cross-
    * multiplied: 2n ≤ nonspace ≤ 12n instead of 2 ≤ nonspace/n ≤ 12)
    * so the gate is bit-identical across engines — a quality filter
    * that flickers between runs silently changes the training corpus.
    * Rules (bounds as arguments so pipelines tune per corpus):
    *  1. n_tokens < minTokens            → too_short
    *  2. n_tokens > maxTokens            → too_long
    *  3. mean word length ∉ [2, 12]      → word_length
    *  4. stopword mass < 1/50 of tokens  → low_stopword */
  def gopherReject(text: Column, minTokens: Int = 15,
                   maxTokens: Int = 90): Column = {
    val t = tokens(text)
    val n = size(t).cast("long")
    val nonspace = length(regexp_replace(text, " ", "")).cast("long")
    val nStop = markerCount(t, FilterStopwords).cast("long")
    when(n < minTokens, lit("too_short"))
      .when(n > maxTokens, lit("too_long"))
      .when(nonspace < lit(2L) * n || nonspace > lit(12L) * n,
        lit("word_length"))
      .when(nStop * 50L < n, lit("low_stopword"))
  }
}
