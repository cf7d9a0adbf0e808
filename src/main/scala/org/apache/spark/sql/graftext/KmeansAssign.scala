/** Lives under org.apache.spark.sql for the private[sql] Catalyst
  * surface, like the rest of graftext. */
package org.apache.spark.sql.graftext

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** A k-means centroid table flattened row-major: centroid r is
  * `listIds(r)` with elements `flat(r*dim + 0 .. r*dim + dim-1)`.
  * Rows must be sorted by list id ascending (the kernel's insertion
  * tie-break relies on ascending iteration order only for stability;
  * correctness comes from comparing the ids themselves).
  */
case class CentroidMatrix(listIds: Array[Int], flat: Array[Double], dim: Int)
    extends Serializable {
  require(dim > 0, s"CentroidMatrix: dim must be > 0, got $dim")
  require(listIds.length * dim == flat.length,
    s"CentroidMatrix: flat length ${flat.length} != k*dim = ${listIds.length * dim}")
  def k: Int = listIds.length

  /** Per-centroid self dot products c·c, the same left-to-right fold
    * Catalyst constant-folds `dot_product(ca, ca)` to in the literal
    * form — computed once per (executor, matrix), not per row. */
  @transient lazy val selfDots: Array[Double] = {
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var s = 0.0
      var j = 0
      val base = r * dim
      while (j < dim) { s += flat(base + j) * flat(base + j); j += 1 }
      out(r) = s
      r += 1
    }
    out
  }
}

/** The top-`nprobe` nearest centroid list ids of a vector in ONE native
  * expression — the scale transport for IVF centroid assignment.
  *
  * Exists because the literal-inlined column form (an `array_sort` over
  * k structs of `dot_product(v, array(dim literals))` chains) embeds the
  * whole nLists×dim centroid matrix in the plan: KB-small and correct at
  * toy nLists, but a realistic IVF (nLists 10³–10⁵, dim 512–1024) makes
  * it megabytes of plan whose generated method crosses HotSpot's 8 KB
  * JIT ceiling and silently runs interpreted — the exact failure the
  * LshBandBuckets kernel fixed for LSH bands. Here the matrix rides
  * either as one reference array (plan-comfortable sizes — the
  * LshBandBuckets pattern) or as a torrent-broadcast handle fetched once
  * per executor (the BloomMightContainBcast pattern); the per-row work
  * is a fixed primitive loop, JIT-compiled at any k.
  *
  * Arithmetic is BIT-IDENTICAL to the literal form (and so to the SQL
  * oracle that replays it as a ROW_NUMBER over the same ordering):
  *  - squared L2 (byCosine = false): d = (v·v − 2.0·v·c) + c·c, the
  *    exact association order of `dot(v,v) - lit(2.0)*dot(v,c) + dot(c,c)`;
  *  - negative cosine (byCosine = true):
  *    d = −1.0 · (v·c / (sqrt(v·v) · sqrt(c·c))).
  * Every dot product is the same left-to-right fold as [[DotProduct]]
  * (v·v over the FULL input vector, v·c over min(|v|, dim), null
  * elements contribute 0), and candidates order by (d, list id) with
  * doubles compared exactly as Spark sorts them (`==` first — so ±0.0
  * tie and break on the list id — then `java.lang.Double.compare`, NaN
  * greatest), matching both `array_sort` and `ORDER BY` in the oracle.
  *
  * A null input vector yields null (standard propagation); the library
  * wrapper coalesces to the ascending-list-id prefix, which is what the
  * literal form's all-null distance structs sort to.
  */
case class KmeansNearestLists(child: Expression,
                              cents: Either[CentroidMatrix, Broadcast[CentroidMatrix]],
                              byCosine: Boolean, nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nprobe >= 1, s"KmeansNearestLists: nprobe must be >= 1, got $nprobe")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "kmeans_nearest_lists"

  /** Resolved once per (executor, expression instance): either the
    * plan-carried matrix or the executor-local broadcast cache read. */
  @transient lazy val matrix: CentroidMatrix = cents.fold(identity, _.value)

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  /** Spark's double sort order: ±0.0 equal, NaN greatest and
    * self-equal — `SQLOrderingUtil.compareDoubles` semantics. */
  private def cmpD(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Shared per-row kernel (public: generated code calls it). */
  def compute(v: ArrayData): GenericArrayData = {
    val m = matrix
    val dim = m.dim
    val k = m.k
    val nV = v.numElements()
    // v·v over the FULL vector (dot(vec, vec) in the literal form)
    var vv = 0.0
    var j = 0
    while (j < nV) {
      if (!v.isNullAt(j)) { val x = v.getDouble(j); vv += x * x }
      j += 1
    }
    val normV = if (byCosine) Math.sqrt(vv) else 0.0
    val nVC = math.min(nV, dim)
    val p = math.min(nprobe, k)
    val bestD = new Array[Double](p)
    val bestL = new Array[Int](p)
    var count = 0
    var r = 0
    while (r < k) {
      val base = r * dim
      var vc = 0.0
      j = 0
      while (j < nVC) {
        if (!v.isNullAt(j)) vc += v.getDouble(j) * m.flat(base + j)
        j += 1
      }
      val cc = m.selfDots(r)
      val d =
        if (byCosine) -1.0 * (vc / (normV * Math.sqrt(cc)))
        else (vv - 2.0 * vc) + cc
      val l = m.listIds(r)
      val insert =
        if (count < p) true
        else {
          val c = cmpD(d, bestD(p - 1))
          c < 0 || (c == 0 && l < bestL(p - 1))
        }
      if (insert) {
        // walk left while the candidate orders strictly before the
        // predecessor — insertion sort into the (d, list) order
        var pos = if (count < p) count else p - 1
        while (pos > 0 && {
          val c = cmpD(d, bestD(pos - 1))
          c < 0 || (c == 0 && l < bestL(pos - 1))
        }) pos -= 1
        var i = if (count < p) count else p - 1
        while (i > pos) { bestD(i) = bestD(i - 1); bestL(i) = bestL(i - 1); i -= 1 }
        bestD(pos) = d
        bestL(pos) = l
        if (count < p) count += 1
      }
      r += 1
    }
    val out = new Array[Int](count)
    var i = 0
    while (i < count) { out(i) = bestL(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression itself rides along as a reference object: the
    // generated code calls the SAME compute() the interpreted path uses
    val self = ctx.addReferenceObj("kmeansNearest", this,
      classOf[KmeansNearestLists].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
