package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: tokenization,
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  * All pure `functions._` combinators (codegen'd, no UDFs) so they stay
  * inside whole-stage codegen over the 100 TB `documents` scan.
  */
object TextFns {

  /** Whitespace tokenizer, empty tokens dropped. Null text → null. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Token count (whitespace tokenization). Null text → null: the session
    * runs ANSI-off, where legacy `size(null)` is -1, and a bare size()
    * would silently poison every ratio built on it (-1/-1 = 1.0) — every
    * counting function here guards explicitly so null in = null out, the
    * same contract the DuckDB oracles' len()/list functions have.
    */
  def tokenCount(text: Column): Column = Expressions.tokenCount(text)

  /** The Column form of [tokenCount] — the differential baseline (the
    * filter lambda is an interpreted HOF; the native byte scan replaced
    * it on the hot paths, TextFnsSpec pins equality).
    */
  def tokenCountColumns(text: Column): Column =
    when(text.isNotNull, size(tokens(text)))

  /** BPE-ish sub-word count: splits on word/number/punct boundaries like a
    * byte-pair pre-tokenizer would (letters runs, digit runs, single punct).
    * Null text → null.
    */
  def subwordCount(text: Column): Column =
    when(text.isNotNull,
      size(filter(split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
        t => t.rlike("\\S")))) // drop empty + all-whitespace fragments (tabs, newlines)

  /** Punctuation character ratio ∈ [0,1]. */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / len)
  }

  /** Ratio of tokens found in a stopword list (signal of natural language).
    * Null text → null (see [tokenCount] for the legacy size(null) hazard).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val h = Expressions.profileHits(text, Seq(stopwords))
    when(text.isNull, lit(null).cast("double"))
      .when(h.getItem(0) === 0, lit(0.0))
      .otherwise(h.getItem(1).cast("double") / h.getItem(0))
  }

  /** Column form of [stopwordRatio] — differential baseline (interpreted
    * HOF filter; see [tokenCountColumns]).
    */
  def stopwordRatioColumns(text: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(lower(text))
    when(text.isNull, lit(null).cast("double"))
      .when(size(ts) === 0, lit(0.0))
      .otherwise(
        size(filter(ts, t => t.isin(stopwords.map(lit): _*))).cast("double") / size(ts))
  }

  /** Composite document quality score ∈ [0,1]: mean-word-length sanity,
    * stopword presence, low punctuation noise, non-trivial length.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = LangId.profiles.flatMap(_._2)): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanWordLen = when(nTok === 0, lit(0.0)).otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / nTok)
    val lenOk = when(nTok >= 10 && nTok <= 100000, lit(1.0)).otherwise(lit(0.3))
    val wordLenOk = when(meanWordLen >= 2.0 && meanWordLen <= 12.0, lit(1.0)).otherwise(lit(0.3))
    val punctOk = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopOk = least(stopwordRatio(text, stopwords.distinct) * 5, lit(1.0))
    // no round(): element-wise doubles are bit-identical across engines,
    // rounding is what diverges (see verify skill notes). Null text → null
    // score (without the guard the otherwise() branches would mix 0.3
    // defaults with null-skipping least() into a meaningless number).
    when(text.isNotNull,
      lenOk * 0.25 + wordLenOk * 0.25 + punctOk * 0.25 + stopOk * 0.25)
  }

  /** Deterministic language-ID heuristic: count stopword hits per language
    * profile, argmax with fixed tie order (profile declaration order).
    * N-gram-free but same shape as fastText-style scoring; SQL-expressible,
    * so it is oracle-testable (see SparkEntry).
    */
  object LangId {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "with"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
      "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "dans"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf"))

    def score(text: Column, words: Seq[String]): Column =
      size(filter(tokens(lower(text)), t => t.isin(words.map(lit): _*)))

    /** Best-scoring language, or "und" when nothing matches; null text →
      * null (legacy size(null) = -1 would otherwise score every profile -1
      * and the first profile would win the argmax).
      */
    def langId(text: Column): Column = {
      // ONE native pass counts every profile's hits; codegen's
      // subexpression elimination shares the call across the argmax
      // when-chain (the Column-form twin below re-filtered the token
      // array per profile, interpreted)
      val h = Expressions.profileHits(text, profiles.map(_._2))
      val scores = profiles.zipWithIndex.map { case ((lang, _), i) =>
        (lang, h.getItem(i + 1)) }
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      scores.foldLeft(
        when(text.isNull, lit(null).cast("string")).when(best === 0, lit("und"))) {
        case (acc, (lang, s)) => acc.when(s === best, lit(lang))
      }.otherwise(lit("und"))
    }

    /** Column form of [langId] — differential baseline (TextFnsSpec). */
    def langIdColumns(text: Column): Column = {
      val scores = profiles.map { case (lang, ws) => (lang, score(text, ws)) }
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      scores.foldLeft(
        when(text.isNull, lit(null).cast("string")).when(best === 0, lit("und"))) {
        case (acc, (lang, s)) => acc.when(s === best, lit(lang))
      }.otherwise(lit("und"))
    }
  }

  /** PII redaction patterns. Deliberately RE2-compatible (no lookarounds,
    * no backreferences) so the exact same pattern strings run in Spark
    * (java.util.regex) and the DuckDB oracle (RE2) with identical results —
    * the qt17 differential holds both engines to the same redaction.
    */
  object Pii {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "[+(]?\\d[\\d .()-]{6,}\\d"
  }

  /** Redacts emails, IPv4 addresses, and phone-shaped digit runs with
    * typed placeholder tokens — the minimum-viable scrub pass a training
    * corpus needs before anything else touches it. Order matters: emails
    * first (their local parts can contain digits), then IPs (dotted quads
    * would otherwise be eaten as phone digits), then phones.
    *
    * Production path is the native expression (one byte-scan prefilter +
    * three pre-compiled regex passes over a single String
    * materialization — see ExprImpl.scrubPii); [scrubPiiColumns] below is
    * the same semantics as chained built-ins, retained as the independent
    * differential baseline (PackSpec pins equality on PII, digit-bearing,
    * unicode-digit, empty, and null rows).
    */
  def scrubPii(text: Column): Column = Expressions.scrubPii(text)

  /** The chained-built-ins form of [scrubPii] — the differential baseline.
    * Prefilter: every pattern requires an '@' or an ASCII digit, so a doc
    * containing neither is returned untouched after ONE char-class scan
    * instead of three complex-regex passes; on a PII-bearing row the three
    * `regexp_replace`s each re-materialize a String, which is what the
    * native form collapses.
    */
  def scrubPiiColumns(text: Column): Column =
    when(!text.rlike("[@0-9]"), text).otherwise(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, Pii.email, "<EMAIL>"),
          Pii.ipv4, "<IP>"),
        Pii.phone, "<PHONE>"))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * stable content hash for exact dedup across formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** 64-bit rolling content hash (xxhash64 of normalized text) — cheap
    * integer fingerprint for join keys / bucketing at scale.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Count of characters in the given Unicode script (Java script names:
    * "Latin", "Cyrillic", "Han", …). The charset-level sibling of [LangId]:
    * langid's n-gram profiles only separate languages WITHIN a script, so
    * curation pipelines gate on script mix first (a "Latin" doc that is
    * 40% Han is mislabeled or mixed — route it, don't trust the langid).
    * Pure codegen'd regexp count, no shuffle. Counts are UTF-16 units;
    * identical to code points for BMP scripts (supplementary-plane CJK
    * extensions count 2 — threshold on ratios, not exact counts, if those
    * matter).
    */
  def scriptCount(text: Column, script: String): Column =
    length(regexp_replace(text, s"[^\\p{Is$script}]", "")).cast("long")

  /** Non-whitespace character count — the denominator script/charset
    * ratios are taken over. */
  def charCount(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("long")

  /** Compressibility quality signal (the MassiveText/Gopher family's
    * repetition rule, Rae et al. 2021: machine-generated and boilerplate
    * text DEFLATEs far below natural prose): compressed/raw byte ratio,
    * one codegen'd pass per row. Empty text reports ratio 1.0 (nothing to
    * judge). The ratio is JVM-zlib-specific, so its catalog entry is
    * rows-only — thresholds should be calibrated per corpus anyway.
    */
  def compressionRatio(text: Column, level: Int = 6): Column =
    when(octet_length(text) === 0, lit(1.0))
      .otherwise(round(Expressions.deflateLen(text, level).cast("double") /
        octet_length(text).cast("double"), 6))
}
