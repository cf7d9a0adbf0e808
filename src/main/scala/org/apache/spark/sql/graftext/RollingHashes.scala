package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 fingerprints of every w-token window of a token array, in
  * one tight JVM loop.
  *
  * The column-function equivalent
  * (`transform(sequence(...), i => xxhash64(concat_ws(" ", slice(toks, i, w))))`)
  * interprets four nested higher-order expressions per window and
  * copies a w-element slice each time; this expression walks the array
  * once per window with no intermediate Catalyst values. Same hash
  * family (XXH64, seed 42 — Spark's xxhash64 default) over the same
  * space-joined window text.
  */
case class RollingHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  private val seed = 42L
  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val windows = math.max(n - w + 1, 1)
    val out = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      val len = math.min(w, n - i)
      // Null elements are SKIPPED (not empty-substituted) to match the
      // documented column-function equivalent: concat_ws omits nulls, so
      // ["a", null, "b"] joins to "a b", never "a  b".
      val parts = new Array[UTF8String](len)
      var m = 0
      var j = 0
      while (j < len) {
        if (!toks.isNullAt(i + j)) {
          parts(m) = toks.getUTF8String(i + j)
          m += 1
        }
        j += 1
      }
      val joined = UTF8String.concatWs(space, parts.take(m): _*)
      out(i) = XXH64.hashUnsafeBytes(joined.getBaseObject, joined.getBaseOffset,
        joined.numBytes(), seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}
