package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  * a w-element slice per window; this walks the array once.
  */
case class RollingNgrams(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "rolling_ngrams"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val windows = math.max(n - w + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    val parts = new Array[UTF8String](w)
    var i = 0
    while (i < windows) {
      val len = math.min(w, n - i)
      var m = 0
      var j = 0
      while (j < len) {
        if (!toks.isNullAt(i + j)) {
          parts(m) = toks.getUTF8String(i + j)
          m += 1
        }
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts.take(m): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): RollingNgrams =
    copy(child = newChild)
}
