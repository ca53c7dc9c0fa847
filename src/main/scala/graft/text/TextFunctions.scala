package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language identification, fingerprinting.
 * All are pure Catalyst column algebra (whole-stage codegen'd, no UDFs), so
 * they scale linearly and push through the optimizer.
 */
object TextFunctions {

  /** Whitespace token count (0 for blank text). */
  def tokenCountWs(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish token count: word pieces + standalone punctuation
   * (`\w+|[^\w\s]`), the usual pre-tokenizer shape. */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Punctuation characters (everything except word chars + whitespace). */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[\\w\\s]", ""))

  /** Mean word length over whitespace tokens. */
  def meanWordLen(c: Column): Column =
    when(tokenCountWs(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s", "")).cast("double") /
        tokenCountWs(c).cast("double"))

  private val enStop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")

  /** Fraction of tokens that are (English) stopwords — a classic quality
   * signal for web-scraped corpora. */
  def stopwordRatio(c: Column): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    when(length(trim(c)) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isInCollection(enStop))).cast("double") /
        size(toks).cast("double"))
  }

  /**
   * Composite quality score in [0,1] from length / punctuation / stopword
   * signals (the reference engine has no text ops; heuristics follow common
   * corpus-filtering practice, e.g. C4/Gopher rules):
   *  - length in a sane band, punctuation not dominating, some stopwords.
   */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val punctRatio = punctCount(c).cast("double") /
      greatest(length(c).cast("double"), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * lit(4.0), lit(1.0))
    val stopScore = least(stopwordRatio(c) * lit(4.0), lit(1.0))
    round((lenScore + punctScore + stopScore) / lit(3.0), 6)
  }

  // ---------------------------------------------------------------------------
  // Language identification: stopword-profile voting + CJK script detection.
  // Pure column algebra: per-language stopword-hit counts → argmax.
  // ---------------------------------------------------------------------------

  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "his", "they", "are", "this", "have", "from"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une",
      "dans", "que", "qui", "pour", "pas", "sur", "avec", "son", "au"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "en", "un",
      "una", "que", "por", "con", "para", "su", "se", "del", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu",
      "den", "von", "mit", "sich", "auf", "für", "nicht", "im", "dem", "ich"),
    "it" -> Seq("il", "la", "di", "e", "che", "un", "una", "per", "con",
      "del", "della", "sono", "non", "si", "da", "le", "nel", "alla"),
    "pt" -> Seq("o", "a", "os", "as", "de", "e", "que", "um", "uma",
      "para", "com", "não", "do", "da", "em", "por", "se", "mais"))

  /** Predicted ISO code ('en','fr','es','de','it','pt','zh' or 'und'). */
  def languageId(c: Column): Column = {
    val toks = split(lower(trim(c)), "[\\s\\p{Punct}]+")
    val nToks = greatest(size(toks).cast("double"), lit(1.0))
    val cjkChars = length(c) - length(regexp_replace(c, "[\\u4e00-\\u9fff]", ""))
    val scores = profiles.map { case (lang, stops) =>
      lang -> (size(filter(toks, t => t.isInCollection(stops))).cast("double") / nToks)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0.05, lit(lang)).otherwise(acc)
    }
    when(cjkChars.cast("double") / greatest(length(c), lit(1)).cast("double") > 0.2, lit("zh"))
      .otherwise(pick)
  }

  /**
   * Document fingerprint: minimum rolling polynomial hash over character
   * k-grams of the normalized text (the winnowing/minhash primitive). Equal
   * texts always collide; near-equal texts collide when they share the
   * minimal k-gram. See [[org.apache.spark.sql.graft.RollingFingerprint]].
   */
  def fingerprint(c: Column, k: Int = 8): Column =
    org.apache.spark.sql.graft.RollingFingerprint(c, k)

  /**
   * Within-document repetition: fraction of word n-gram occurrences that are
   * duplicates of an earlier occurrence, `1 − distinct/total` (0 for a doc
   * with no repeated grams, → 1 for highly repetitive boilerplate). The
   * duplicate-n-gram rule of Gopher/C4-style corpus filtering. Single fused
   * pass — see [[org.apache.spark.sql.graft.NgramProfile]].
   */
  def repetitionRatio(c: Column, n: Int = 3): Column = {
    val p = org.apache.spark.sql.graft.NgramProfile(c, n)
    lit(1.0) - p.getField("distinct_grams").cast("double") /
      p.getField("total_grams").cast("double")
  }

  /**
   * Fraction of word n-gram occurrences taken by the single most frequent
   * n-gram (Gopher's top-n-gram coverage rule): `top/total` in (0, 1].
   */
  def topGramFraction(c: Column, n: Int = 2): Column = {
    val p = org.apache.spark.sql.graft.NgramProfile(c, n)
    p.getField("top_gram_count").cast("double") /
      p.getField("total_grams").cast("double")
  }

  /**
   * Scrub common PII into typed placeholder tokens — the standard
   * email / IPv4 / long-digit-run (phone-ish) pass a training-corpus
   * pipeline applies before release. Pure `regexp_replace` chain
   * (whole-stage codegen, pushes through the optimizer); patterns are
   * deliberately RE2-compatible so external oracles replicate them. The
   * digit-run rule is intentionally aggressive (an 8+-digit run with
   * separators is redacted even when it is a date), the usual
   * over-redaction trade-off.
   */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d() -]{6,}\\d", "<PHONE>")
  }

  /** Number of PII placeholders of the given kind in redacted text
   * (`kind` one of EMAIL, IP, PHONE). */
  def piiCount(redacted: Column, kind: String): Column = {
    val token = s"<$kind>"
    ((length(redacted) - length(replace(redacted, lit(token), lit("")))) /
      token.length).cast("int")
  }
}
