/** Lives under org.apache.spark.sql for the private[sql] Catalyst
  * surface, like the rest of graftext. */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** All `nBands` random-hyperplane band buckets of a vector in ONE
  * native expression: out[band] = Σ_i (v·plane[band·stride+i] > 0) «i.
  *
  * Exists because the literal-inlined column form (nBands × bitsPerBand
  * separate `dot_product(v, array(64 literals))` CASE chains) generates
  * a whole-stage-codegen method past HotSpot's 8 KB JIT ceiling — at
  * the banded near-dup default (8 bands × 12 bits × dim 64) the method
  * is ~26 KB, runs as INTERPRETED BYTECODE, and the bucket computation
  * alone cost 13 s for 20k vectors (650 µs/row for ~6k mult-adds). Here
  * the plane matrix rides along as one flat reference array and the
  * per-row work is a fixed small triple loop shared by the interpreted
  * and generated paths — JIT-compiled, no per-row allocation beyond the
  * output array.
  *
  * Arithmetic is BIT-IDENTICAL to the column form (and so to the SQL
  * oracle): each dot product is the same left-to-right fold over
  * min(|v|, dim) elements, null elements contribute 0, and the sign
  * test is `> 0`. Null-vector handling lives in the wrapper
  * ([[VectorExpressions.lshBandBuckets]] coalesces to all-zero buckets,
  * matching the CASE chain's `otherwise(0)` for a null dot product).
  *
  * `planes` is flattened plane-major: plane p element j at p·dim + j,
  * with nBands·stride planes of `dim` elements each — built from the
  * same deterministic hyperplane family the literal form inlines, so
  * the constants match the SQL oracle exactly.
  */
case class LshBandBuckets(child: Expression, planes: Array[Double],
                          dim: Int, nBands: Int, bitsPerBand: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.length == nBands * stride * dim,
    s"planes length ${planes.length} != nBands*stride*dim = ${nBands * stride * dim}")
  require(bitsPerBand >= 1 && bitsPerBand <= stride,
    s"bitsPerBand $bitsPerBand must be in [1, stride=$stride]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_buckets"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  /** Shared per-row kernel (public: generated code calls it). */
  def compute(v: ArrayData): GenericArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](nBands)
    var bnd = 0
    while (bnd < nBands) {
      var bucket = 0L
      var i = 0
      while (i < bitsPerBand) {
        val base = (bnd * stride + i) * dim
        var s = 0.0
        var j = 0
        while (j < n) {
          if (!v.isNullAt(j)) s += v.getDouble(j) * planes(base + j)
          j += 1
        }
        if (s > 0) bucket |= (1L << i)
        i += 1
      }
      out(bnd) = bucket
      bnd += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression itself rides along as a reference object: the
    // generated code calls the SAME compute() the interpreted path uses
    val self = ctx.addReferenceObj("lshBands", this, classOf[LshBandBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandBuckets {
  /** The deterministic splitmix64 hyperplane family, flattened
    * plane-major (plane p element j at p·dim + j) — the SINGLE source
    * of the constants; graft.sim.Similarity.hyperplanes is a view over
    * this, so the literal/SQL form and the native expression can never
    * drift. plane[p][j] = uniform(mix(seed + p·dim + j)) − 0.5. */
  def flatPlanes(dim: Int, nPlanes: Int, seed: Long = 42L): Array[Double] = {
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(nPlanes * dim) { idx =>
      // top 53 bits → uniform double in [0,1) → shift to [-0.5, 0.5)
      (mix(seed + idx) >>> 11) * 1.1102230246251565e-16 - 0.5
    }
  }
}
