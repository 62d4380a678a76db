package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID, quality scoring, token counting, fingerprinting, shingling.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (codegen'd
  * or native higher-order functions) — no UDFs, no serialization boundary,
  * so each op runs at full scan speed over 100 TB of text. Regex patterns
  * deliberately use the common subset of Java-regex and RE2 syntax so DuckDB
  * oracles can mirror them verbatim.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space split — mirrors string_split in SQL). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: runs of alphanumerics count 1, every other
    * non-space symbol counts 1 — a cheap, deterministic proxy for subword
    * tokenizer cost used for corpus budgeting. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")).cast("long")

  /** Per-language stopword hit count (word-boundary regex). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(words.mkString("\\b(", "|", ")\\b"))).cast("long")

  /** Small fixed stopword lists per language — the classic n-gram/stopword
    * heuristic (public Cavnar-Trenkle-style approach, reduced to the common
    * high-frequency function words). */
  val StopwordTable: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein", "mit"))

  /** Language-ID: argmax of stopword-hit scores, deterministic tie-break in
    * StopwordTable order, "und" (undetermined) when no list hits. */
  def langId(text: Column): Column = {
    val scores = StopwordTable.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s > 0 && s === best, lit(lang)).otherwise(els)
    }
  }

  /** Ratio helpers (null-safe: 0 for empty text). */
  private def ratio(num: Column, den: Column): Column =
    when(den > 0, round(num.cast("double") / den.cast("double"), 6)).otherwise(lit(0.0))

  def punctRatio(text: Column): Column =
    ratio(regexp_count(text, lit("[.,!?;:]")), length(text))

  def upperRatio(text: Column): Column =
    ratio(regexp_count(text, lit("[A-Z]")), length(text))

  def digitRatio(text: Column): Column =
    ratio(regexp_count(text, lit("[0-9]")), length(text))

  def stopwordRatio(text: Column): Column =
    ratio(stopwordHits(text, StopwordTable.flatMap(_._2)), tokenCount(text))

  /** Composite quality score in [0,1]: length band + low-punct + has
    * stopwords — the usual cheap pre-filter before model-based scoring. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lengthOk = when(nTok.between(10, 5000), lit(0.4)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.1, lit(0.3)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text) > 0.05, lit(0.3)).otherwise(lit(0.0))
    round(lengthOk + punctOk + stopOk, 2)
  }

  /** PII scrubbing (C4-style cleanup): redact email addresses, then
    * phone-number-shaped digit runs. Pure regexp_replace — codegen'd,
    * identical regex dialect in the DuckDB oracle. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>")

  /** Extended PII scrub: email, IPv4, SSN-format, credit-card-format,
    * phone — all public patterns, RE2-compatible (no lookaround/
    * backreferences) so the identical regex runs in the oracle. ORDER
    * MATTERS: the specific shapes (SSN dashes, card groups) must redact
    * before the greedy phone digit-run pattern eats them. Format-only
    * matching (no Luhn checksum): over-redaction is the right failure
    * mode for a training-corpus scrubber. */
  def scrubPiiExtended(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\.){3}" +
        "(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\\b", "<IP>")
    val ssn = regexp_replace(ip, "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
    val cc = regexp_replace(ssn,
      "\\b(?:[0-9]{4}[ -]){3}[0-9]{4}\\b|\\b[0-9]{13,16}\\b", "<CC>")
    regexp_replace(cc, "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>")
  }

  /** Content-defined fingerprint: md5 of case/punctuation/whitespace
    * normalized text — catches trivial re-formattings as exact dups. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Polynomial rolling hash over whitespace tokens (order-sensitive 64-bit
    * document hash; base-31 Horner over xxhash64 of each token). Long
    * overflow wraps — deterministic on every platform. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, tok) => acc * lit(31L) + xxhash64(tok))

  /** Word n-gram shingles (distinct), the unit set for Jaccard/MinHash.
    * Backed by a custom Catalyst expression (graft.expressions.ShingleExpr):
    * the equivalent transform/array_distinct HOF chain is interpreted
    * per-element and measured 10x slower on the dedup pipelines. */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.ShingleExpr.shingles(text, n)

  /** Word n-gram occurrences, duplicates kept — for occurrence-count
    * rules (repetition filters), same one-pass expression. */
  def shinglesAll(text: Column, n: Int): Column =
    graft.expressions.ShingleExpr.shinglesAll(text, n)

  /** Character n-gram shingles (distinct) of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
    array_distinct(
      when(length(norm) >= n,
        transform(sequence(lit(1), length(norm) - n + 1),
          i => norm.substr(i, lit(n))))
        .otherwise(array(norm)))
  }

  /** The Gopher-style quality-rule column family — ONE definition shared
    * by the quality query (q44), the attrition funnel, and the corpus
    * health dashboard, so a threshold tweak can never desynchronize the
    * report from the filter it describes. */
  final case class GopherRules(nWords: Column, meanWordLen: Column,
                               symbolRatio: Column, dupSegRatio: Column,
                               pass: Column)

  def gopherRules(text: Column): GopherRules = {
    val words = split(text, " ", -1)
    val nWords = size(words).cast("long")
    val mwl = round(length(regexp_replace(text, " ", "")).cast("double") / nWords, 6)
    val symbols = (length(text) - length(regexp_replace(text, "#", ""))).cast("double") +
      (length(text) - length(replace(text, lit("..."), lit("")))).cast("double") / 3
    val symRatio = round(symbols / nWords, 6)
    val segs = split(text, "\\. ", -1)
    val dupSegRatio = round((size(segs) - size(array_distinct(segs))).cast("double") /
      size(segs), 6)
    GopherRules(nWords, mwl, symRatio, dupSegRatio,
      nWords.between(50, 100000) && mwl.between(3, 10) &&
        symRatio < 0.1 && dupSegRatio < 0.3)
  }

  /** Flesch reading-ease over whitespace tokens: sentences are `[.!?]+`
    * runs (floored at 1 — headline-style fragments count as one),
    * syllables the classic vowel-group approximation (`[aeiouy]+` runs
    * in lowercased text; no dictionary needed, stable across engines).
    * `flesch6` lands on the 6dp grid: both engines evaluate the same
    * literal-coefficient IEEE sequence `206.835 - 1.015*W/S -
    * 84.6*Y/W` before one floor. All scan-side — no shuffle, no UDF. */
  final case class FleschStats(nWords: Column, nSentences: Column,
                               nSyllables: Column, flesch6: Column, band: Column)

  def fleschStats(text: Column): FleschStats = {
    val w = size(split(text, " ", -1)).cast("long")
    val s = greatest(lit(1L), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"))
    val y = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))).cast("long")
    val f6 = floor((lit(206.835d)
      - lit(1.015d) * w.cast("double") / s.cast("double")
      - lit(84.6d) * y.cast("double") / w.cast("double")) * 1e6 + lit(0.5d))
      .cast("long")
    val band = when(f6 >= 90000000L, "very_easy")
      .when(f6 >= 70000000L, "easy")
      .when(f6 >= 50000000L, "medium")
      .when(f6 >= 30000000L, "difficult")
      .otherwise("very_difficult")
    FleschStats(w, s, y, f6, band)
  }

  /** Mixed-script (homoglyph-spoof) screen: tokens containing BOTH a
    * Latin letter and a Cyrillic character — the signature of confusable
    * substitution (`раypal`) that survives NFC normalization (q176) and
    * defeats exact dedup/blocklists. Per-row higher-order filters over
    * the token array; zero shuffle. Regex dialects differ (Java
    * `\p{IsCyrillic}`, RE2 `\p{Cyrillic}`) but match the same block. */
  final case class MixedScriptStats(nTokens: Column, nCyrillic: Column,
                                    nMixed: Column, spoof: Column)

  def mixedScriptStats(text: Column): MixedScriptStats = {
    val toks = split(text, " ", -1)
    val cyr = "\\p{IsCyrillic}"
    val nCyr = size(filter(toks, t => t.rlike(cyr))).cast("long")
    val nMixed = size(filter(toks, t => t.rlike(cyr) && t.rlike("[a-zA-Z]")))
      .cast("long")
    MixedScriptStats(size(toks).cast("long"), nCyr, nMixed, nMixed > 0L)
  }
}
