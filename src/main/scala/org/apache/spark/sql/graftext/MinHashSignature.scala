package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
  * (id, k×8 bytes) straight into LSH banding. Codegen emits a static
  * call into [[GraftKernels]], keeping the minhash pipeline inside
  * whole-stage codegen.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.minhashSignature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.minhashSignature($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
