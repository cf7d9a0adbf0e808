package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Z-order (Morton) interleave of the low `bitsPerDim` bits of each
  * dimension: bit j of dimension k lands at position j·D + k of the
  * result, so lexicographic order on the output walks the Z space-
  * filling curve — rows close in EVERY dimension land close on the
  * curve. Sorting/range-partitioning 100 TB by this single long before
  * a columnar write gives every file a bounded min/max box in ALL
  * interleaved dimensions at once, so multi-dimensional range
  * predicates prune files/row-groups the way a linear sort only prunes
  * its leading column (the layout trick popularized by columnar lake
  * formats; the curve itself is Morton 1966).
  *
  * Dimensions must be non-negative and fit `bitsPerDim` bits (values
  * are masked, so an overflowing dimension degrades locality rather
  * than erroring — callers normalize first; D·bitsPerDim ≤ 63 is
  * enforced). One tight loop per row, codegen'd via a static
  * [[GraftKernels]] call; the column-function equivalent
  * (aggregate over a sequence of bit positions) stays interpreted and
  * allocates per row.
  */
case class ZOrderLong(child: Expression, bitsPerDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_long"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.zorderLong(input.asInstanceOf[ArrayData], bitsPerDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.zorderLong($c, $bitsPerDim);")

  override protected def withNewChildInternal(newChild: Expression): ZOrderLong =
    copy(child = newChild)
}
