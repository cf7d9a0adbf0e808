package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** xxhash64 fingerprints of every w-token window of a token array, in
  * one tight JVM loop.
  *
  * The column-function equivalent
  * (`transform(sequence(...), i => xxhash64(concat_ws(" ", slice(toks, i, w))))`)
  * interprets four nested higher-order expressions per window and
  * copies a w-element slice each time; this expression walks the array
  * once per window with no intermediate Catalyst values. Same hash
  * family (XXH64, seed 42 — Spark's xxhash64 default) over the same
  * space-joined window text. Codegen emits a static call into
  * [[GraftKernels]], keeping the surrounding operator inside
  * whole-stage codegen.
  */
case class RollingHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.rollingHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.rollingHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}
