package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics of a text column:
  * struct(n_tokens, max_token_len, n_punct, n_stopwords, n_word_chars,
  * n_alpha_tokens).
  *
  * Reproduces exactly the column-function arithmetic used by
  * graft.text.TextAnalysis (and replayed by the SQL oracles):
  *   - tokens = split(text, "\s+") with Java split limit -1 semantics:
  *     a leading whitespace run yields an empty first token, a trailing
  *     run an empty last token, empty input one empty token;
  *   - token/char lengths count UTF-16 units of ASCII text and regex
  *     char-class units generally (\s is the six ASCII whitespace
  *     chars, punct = anything outside [a-zA-Z0-9\s]);
  *   - n_stopwords counts tokens in the fixed stopword list;
  *   - n_word_chars counts non-whitespace code points (the
  *     length(regexp_replace(text, "\s+", "")) arithmetic) — total
  *     word mass, so mean-word-length rules stay in integers;
  *   - n_alpha_tokens counts tokens containing at least one ASCII
  *     letter (the rlike("[a-zA-Z]") per-token test) — the Gopher
  *     "fraction of words with an alphabetic character" numerator.
  * The separate column functions each re-split the text; this walks it
  * once.
  */
object TextStats {
  /** The canonical stopword list (re-exported as
    * graft.text.TextAnalysis.stopwords; also the list the SQL-surface
    * `text_stats` function binds). */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was", "for",
    "on", "with", "as", "at", "by", "it", "this", "that")
}

case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("max_token_len", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_word_chars", IntegerType, nullable = false),
    StructField("n_alpha_tokens", IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopwords.size * 2)
    stopwords.foreach(s.add)
    s
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var nTokens = 0
    var maxLen = 0
    var nPunct = 0
    var nStop = 0
    var nWordChars = 0
    var nAlphaTokens = 0
    var tokenStart = 0
    var tokenCp = 0 // code points in the current token
    var tokenHasAlpha = false
    var i = 0
    // Lengths count CODE POINTS, not UTF-16 units: `length()` and Java
    // regex char classes (the column functions this expression pins
    // parity with) treat a surrogate pair as one character, so a
    // supplementary-plane char (emoji, rare CJK) must count 1 here too.
    def closeToken(end: Int): Unit = {
      nTokens += 1
      if (tokenCp > maxLen) maxLen = tokenCp
      if (tokenCp > 0 && tokenCp <= 5 && stopSet.contains(s.substring(tokenStart, end))) nStop += 1
      if (tokenHasAlpha) nAlphaTokens += 1
      tokenCp = 0
      tokenHasAlpha = false
    }
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        closeToken(i)
        // skip the whole whitespace run (\s is ASCII-only → BMP-only,
        // so a per-char test is exact)
        i += 1
        while (i < n && isWs(s.charAt(i))) i += 1
        tokenStart = i
      } else {
        val cp = s.codePointAt(i)
        if (!(cp < 128 && isAlnum(cp.toChar))) nPunct += 1
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) tokenHasAlpha = true
        tokenCp += 1
        nWordChars += 1
        i += Character.charCount(cp)
      }
    }
    closeToken(n)
    InternalRow(nTokens, maxLen, nPunct, nStop, nWordChars, nAlphaTokens)
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
