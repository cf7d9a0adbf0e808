package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, all built from
  * codegen'd `org.apache.spark.sql.functions` (no UDFs — every operator
  * stays inside whole-stage codegen and scales linearly with executors).
  */
object TextAnalysis {

  /** Whitespace tokenizer (the pipeline's canonical token unit). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphabetic runs, digit runs and single
    * punctuation marks each count as one token — a cheap, deterministic
    * proxy for a real BPE vocabulary. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Longest token length (quality signal: gibberish has long runs). */
  def maxTokenLen(text: Column): Column =
    array_max(transform(tokens(text), t => length(t)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))

  /** Fraction of tokens that are stopwords, in exact decimal so the
    * value is engine-independent. (Canonical list lives with the native
    * expression so the SQL-surface `text_stats` binds the same one.) */
  val stopwords: Seq[String] =
    org.apache.spark.sql.graftext.TextStats.defaultStopwords

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit): _*)))

  /** Total word mass: non-whitespace character count (the
    * mean-word-length numerator, kept as an integer so length rules
    * never divide). */
  def wordCharCount(text: Column): Column =
    length(regexp_replace(text, "\\s+", ""))

  /** Tokens containing at least one ASCII letter (the Gopher
    * alphabetic-word-fraction numerator). */
  def alphaTokenCount(text: Column): Column =
    size(filter(tokens(text), t => t.rlike("[a-zA-Z]")))

  /** All six token counters in ONE native pass:
    * struct(n_tokens, max_token_len, n_punct, n_stopwords,
    * n_word_chars, n_alpha_tokens). Project it once and reference the
    * fields — each column function above re-splits the text per use.
    * Semantics are identical (the spec pins field-for-field parity). */
  def textStats(text: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.textStats(text, stopwords)

  /** Composite quality score in [0,100], integer arithmetic only (no
    * float divergence): penalties for too-short text, no stopwords,
    * excessive punctuation, very long tokens. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val shortPenalty = when(nTok < 10, 40).otherwise(0)
    val stopPenalty = when(stopwordCount(text) === 0, 25).otherwise(0)
    val punctPenalty = when(punctCount(text) * 5 > length(text), 20).otherwise(0)
    val longTokPenalty = when(maxTokenLen(text) > 30, 15).otherwise(0)
    lit(100) - shortPenalty - stopPenalty - punctPenalty - longTokPenalty
  }

  /** qualityScore computed from an already-projected textStats struct
    * (st) — lets the text be scanned once per row instead of once per
    * counter. */
  def qualityScoreFrom(st: Column, text: Column): Column = {
    val shortPenalty = when(st("n_tokens") < 10, 40).otherwise(0)
    val stopPenalty = when(st("n_stopwords") === 0, 25).otherwise(0)
    val punctPenalty = when(st("n_punct") * 5 > length(text), 20).otherwise(0)
    val longTokPenalty = when(st("max_token_len") > 30, 15).otherwise(0)
    lit(100) - shortPenalty - stopPenalty - punctPenalty - longTokPenalty
  }

  /** Gopher-style quality rule flags (Rae et al. 2021 §A1.1, adapted to
    * whitespace tokens), computed from one projected textStats struct.
    * Every test is integer arithmetic — ratio thresholds are expressed
    * by cross-multiplication (e.g. mean word length in [lo, hi] ⇔
    * lo·n_tokens ≤ n_word_chars ≤ hi·n_tokens) — so the flags are
    * bit-identical on any engine and never touch a float. Returns the
    * per-rule booleans plus the composite keep; callers select the
    * fields they report on.
    */
  def gopherRules(st: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Int = 3, maxMeanLen: Int = 10,
                  maxSymbolPct: Int = 10, minAlphaPct: Int = 80,
                  minStopwords: Int = 2): Column = {
    val nTok = st("n_tokens")
    val rWords = nTok >= minWords && nTok <= maxWords
    val rMeanLen = st("n_word_chars") >= nTok * minMeanLen &&
      st("n_word_chars") <= nTok * maxMeanLen
    val rSymbol = st("n_punct") * 100 <= nTok * maxSymbolPct
    val rAlpha = st("n_alpha_tokens") * 100 >= nTok * minAlphaPct
    val rStop = st("n_stopwords") >= minStopwords
    struct(
      rWords.as("r_word_count"),
      rMeanLen.as("r_mean_word_len"),
      rSymbol.as("r_symbol_ratio"),
      rAlpha.as("r_alpha_words"),
      rStop.as("r_stopwords"),
      (rWords && rMeanLen && rSymbol && rAlpha && rStop).as("keep"))
  }

  /** Language-ID by marker-word counting — an n-gram-free heuristic with
    * a fixed tie order (en > de > es > fr > zh), deterministic across
    * engines. Real pipelines plug a model here; the operator shape
    * (argmax over per-language evidence columns) is what matters. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is)\\b",
    "de" -> "\\b(der|und|die|das)\\b",
    "es" -> "\\b(el|la|los|de)\\b",
    "fr" -> "\\b(le|la|les|des)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, p) =>
      l -> size(regexp_extract_all(text, lit(p), lit(0)))
    }

  def detectLang(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in marker order) reaching the max, if any evidence
    scores.reverse.foldLeft(lit("unknown")) { case (acc, (l, sc)) =>
      when(sc > 0 && sc === best, lit(l)).otherwise(acc)
    }
  }

  /** PII patterns, ordered for redaction (emails first — they contain
    * digits a later pattern could half-match). Restricted to the regex
    * subset Java and RE2 evaluate identically (char classes, bounded
    * repetition, \b), so redaction is engine-portable. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone" -> "\\b[0-9]{3}-[0-9]{4}\\b")

  /** Redact PII spans with typed placeholders (<EMAIL>, <IP>, <PHONE>)
    * — the standard pretraining-corpus hygiene pass. Pure
    * regexp_replace chain: narrow, codegen'd, scales with the scan. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, p)) =>
      regexp_replace(c, p, s"<${kind.toUpperCase}>")
    }

  /** Matches of one PII pattern (pre-redaction audit count). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Intra-document repetition: 1 − distinct/total 3-token windows.
    * Boilerplate and looped generations repeat shingles internally, so
    * a high ratio flags low-quality docs (the Gopher-style repetition
    * rule). Integer counts + one exact IEEE division — engine-portable. */
  def selfRepetition(text: Column): Column = {
    val nWin = greatest(size(tokens(text)) - 2, lit(1))
    val nDist = size(graft.dedup.Dedup.shingles(text))
    round(lit(1.0) - nDist.cast("double") / nWin, 6)
  }

  /** 64-bit document fingerprint: xxhash64 of the normalized text
    * (lowercased, whitespace collapsed) — exact-dedup key that is
    * robust to trivial whitespace/case edits. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** Rolling-window content fingerprints: xxhash64 of each w-token
    * window, for fuzzy containment checks. Uses the native RollingHashes
    * expression — one tight loop per row instead of four nested
    * interpreted higher-order functions per window. */
  def rollingFingerprints(text: Column, w: Int = 8): Column =
    org.apache.spark.sql.graftext.VectorExpressions.rollingHashes(tokens(text), w)

  /** The pure column-function form (kept as the test oracle for the
    * native expression). */
  def rollingFingerprintsHof(text: Column, w: Int = 8): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - (w - 1), lit(1))),
      i => xxhash64(concat_ws(" ", slice(toks, i, lit(w)))))
  }
}
