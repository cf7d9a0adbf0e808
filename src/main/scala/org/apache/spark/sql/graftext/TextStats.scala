package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics of a text column:
  * struct(n_tokens, max_token_len, n_punct, n_stopwords).
  *
  * Reproduces exactly the column-function arithmetic used by
  * graft.text.TextAnalysis (and replayed by the SQL oracles):
  *   - tokens = split(text, "\s+") with Java split limit -1 semantics:
  *     a leading whitespace run yields an empty first token, a trailing
  *     run an empty last token, empty input one empty token;
  *   - token/char lengths count UTF-16 units of ASCII text and regex
  *     char-class units generally (\s is the six ASCII whitespace
  *     chars, punct = anything outside [a-zA-Z0-9\s]);
  *   - n_stopwords counts tokens in the fixed stopword list.
  * The four separate column functions each re-split the text; this
  * walks it once.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("max_token_len", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false)))
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
    var tokenStart = 0
    var i = 0
    def closeToken(end: Int): Unit = {
      val len = end - tokenStart
      nTokens += 1
      if (len > maxLen) maxLen = len
      if (len > 0 && len <= 5 && stopSet.contains(s.substring(tokenStart, end))) nStop += 1
    }
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        closeToken(i)
        // skip the whole whitespace run
        i += 1
        while (i < n && isWs(s.charAt(i))) i += 1
        tokenStart = i
      } else {
        if (!isAlnum(c)) nPunct += 1
        i += 1
      }
    }
    closeToken(n)
    InternalRow(nTokens, maxLen, nPunct, nStop)
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
