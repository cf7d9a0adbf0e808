package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass symmetric int8 quantization of an array<double> vector:
  * struct(scale, q, q_sum, q_min, q_max) where
  *   scale = 127 / max|x|   (0 for an all-zero vector),
  *   q_i   = floor(x_i·scale + 0.5)   (codes always in [-127, 127]),
  * and q_sum/q_min/q_max are free by-products of the code loop, used
  * as scalar checksums (a single diverging code shifts q_sum) and
  * monitoring stats.
  *
  * The interpreted HOF form (array_max/transform/aggregate — see
  * graft.sim.Similarity.quantizeInt8Hof, kept as the parity oracle)
  * walks the vector four times through the lambda interpreter; this
  * walks it twice in primitive arithmetic. floor-plus-half instead of
  * round(): HALF_UP vs HALF_EVEN conventions differ between engines,
  * while abs/max/divide/multiply/add/floor are exactly-rounded IEEE
  * everywhere — codes are bit-identical on any engine.
  *
  * Null array → null; null elements quantize as 0 and count into
  * q_sum/q_min/q_max like an explicit zero. Codegen emits a static
  * call into [[GraftKernels]].
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", IntegerType, nullable = false),
    StructField("q_max", IntegerType, nullable = false)))
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.quantizeInt8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.quantizeInt8($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
