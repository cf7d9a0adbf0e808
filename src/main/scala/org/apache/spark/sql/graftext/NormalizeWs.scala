package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lowercase + collapse every `\s+` run to a single space, in one pass.
  *
  * Equivalent to `regexp_replace(lower(s), "\\s+", " ")` (Java regex
  * `\s` = the six ASCII whitespace chars — space, \t, \n, \x0B, \f,
  * \r), but without the java.util.regex machinery, which dominates the
  * document-fingerprint hot path. Lowercasing delegates to
  * UTF8String.toLowerCase, the exact implementation behind lower().
  * Codegen emits a static call into [[GraftKernels]].
  */
case class NormalizeWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_ws"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.normalizeWs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.normalizeWs($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)
}
