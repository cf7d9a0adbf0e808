package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** k-wide MinHash signature of a shingle-hash array, per row.
  *
  * signature[j] = min over shingle hashes g of mix(g, j), where mix is
  * the splitmix64 finalizer over (g + GOLDEN·(j+1)) — an avalanche-
  * quality 64-bit hash family, the same construction used by
  * SplittableRandom. One tight k×|shingles| loop per row.
  *
  * This is a NARROW operation: signatures need no explode and no
  * shuffle (the aggregation formulation — explode shingles, k min
  * aggregates — pays a 64-column hash-aggregate plus an exchange for
  * what is per-row arithmetic). At cluster scale the map stage emits
  * (id, k×8 bytes) straight into LSH banding.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val GOLDEN = 0x9e3779b97f4a7c15L

  @inline private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val seed = GOLDEN * (j + 1)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!hashes.isNullAt(i)) {
          val h = mix(hashes.getLong(i) + seed)
          if (h < best) best = h
        }
        i += 1
      }
      sig(j) = best
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
