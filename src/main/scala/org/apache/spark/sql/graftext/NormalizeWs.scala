package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lowercase + collapse every `\s+` run to a single space, in one pass.
  *
  * Equivalent to `regexp_replace(lower(s), "\\s+", " ")` (Java regex
  * `\s` = the six ASCII whitespace chars — space, \t, \n, \x0B, \f,
  * \r), but without the java.util.regex machinery, which dominates the
  * document-fingerprint hot path. Lowercasing delegates to
  * UTF8String.toLowerCase, the exact implementation behind lower().
  */
case class NormalizeWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_ws"

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var inRun = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (!inRun) { sb.append(' '); inRun = true }
      } else {
        sb.append(c)
        inRun = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)
}
