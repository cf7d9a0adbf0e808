package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
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
  * q_sum/q_min/q_max like an explicit zero.
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", IntegerType, nullable = false),
    StructField("q_max", IntegerType, nullable = false)))
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(arr.getDouble(i))
        if (v > m) m = v
      }
      i += 1
    }
    val scale = if (m == 0.0) 0.0 else 127.0 / m
    val q = new Array[Byte](n)
    var sum = 0L
    var mn = if (n == 0) 0 else Int.MaxValue
    var mx = if (n == 0) 0 else Int.MinValue
    i = 0
    while (i < n) {
      val x = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i)
      val b = math.floor(x * scale + 0.5).toInt // in [-127, 127] by construction
      q(i) = b.toByte
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    InternalRow(scale, UnsafeArrayData.fromPrimitiveArray(q), sum, mn, mx)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
