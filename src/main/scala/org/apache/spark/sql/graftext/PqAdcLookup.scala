/** Lives under org.apache.spark.sql for the private[sql] Catalyst
  * surface, like the rest of graftext. */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** The PQ asymmetric-distance (ADC) sum in ONE native expression: given
  * a row's m subspace codes, return Σ_s lut[s·nCents + code_s] — m
  * primitive array reads and adds per row.
  *
  * Exists because the literal form
  * (`element_at(array(lit…), code+1) + …` per subspace) embeds the
  * whole m×nCents LUT in the plan as array literals: fine at toy
  * nCents=16 (128 doubles), but the literature operating point
  * nCents=256 makes it 2048 plan literals whose generated method
  * bloats toward HotSpot's 8 KB JIT ceiling — the same transport
  * failure LshBandBuckets and KmeansNearestLists fixed. Here the LUT
  * rides as ONE reference array on the expression (kilobytes —
  * m·nCents doubles — so the in-plan transport is always comfortable;
  * a broadcast variant is unnecessary at any realistic m·nCents), and
  * the per-row work is a fixed m-iteration primitive loop, JIT-compiled
  * at any nCents.
  *
  * Arithmetic is BIT-IDENTICAL to the literal form it replaces: the
  * same left-to-right add over subspaces 0..m-1 of the same
  * driver-computed doubles, so the SQL oracle's `term0.t + term1.t + …`
  * replay still hash-matches.
  *
  * Null handling: a null code array yields null (standard unary
  * propagation). Null ELEMENTS and out-of-range codes fail fast — codes
  * come from the kmeans-assign kernel (containsNull = false, ids
  * 0..nCents-1), so either means the caller wired the wrong column.
  */
case class PqAdcLookup(child: Expression, lut: Array[Double], nCents: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nCents > 0, s"PqAdcLookup: nCents must be > 0, got $nCents")
  require(lut.length > 0 && lut.length % nCents == 0,
    s"PqAdcLookup: lut length ${lut.length} must be a positive multiple of nCents=$nCents")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_lookup"

  private val m: Int = lut.length / nCents

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  /** Shared per-row kernel (public: generated code calls it). */
  def compute(codes: ArrayData): Double = {
    require(codes.numElements() == m,
      s"pq_adc_lookup: expected $m codes, got ${codes.numElements()}")
    var s = 0.0
    var i = 0
    while (i < m) {
      require(!codes.isNullAt(i), s"pq_adc_lookup: null code at subspace $i")
      val c = codes.getInt(i)
      require(c >= 0 && c < nCents,
        s"pq_adc_lookup: code $c at subspace $i out of range [0, $nCents)")
      s += lut(i * nCents + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression rides along as a reference object — the LUT is a
    // kernel argument, never a parsed literal tree
    val self = ctx.addReferenceObj("pqAdcLookup", this,
      classOf[PqAdcLookup].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
