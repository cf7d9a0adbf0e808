package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends UnaryExpression with ExpectsInputTypes {

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

  override def nullSafeEval(input: Any): Any =
    GraftKernels.textStats(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword set rides along as a referenced object so generated
    // code reads the SAME HashSet instance the interpreted path uses
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.textStats($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}
