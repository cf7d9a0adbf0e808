package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}

/** Distinct space-joined w-token windows (shingles) of a token array, in
  * one tight JVM loop.
  *
  * Semantics match the column-function chain
  * `array_distinct(transform(sequence(1, greatest(n-w+1, 1)),
  *   i => concat_ws(" ", slice(toks, i, w))))` exactly:
  *   - windows start at every position 1..max(n-w+1, 1) (an input
  *     shorter than w yields its single, shorter window);
  *   - null tokens are skipped, as concat_ws does;
  *   - distinct keeps first-occurrence order, as array_distinct does.
  * The chain interprets five nested higher-order expressions and copies
  * a w-element slice per window; this walks the array once. Codegen
  * emits a static call into [[GraftKernels]].
  */
case class RollingNgrams(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "rolling_ngrams"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.rollingNgrams(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.rollingNgrams($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): RollingNgrams =
    copy(child = newChild)
}
