package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity in [0, 1] — the entity-resolution
  * scorer Spark lacks natively (`functions.levenshtein` is the only
  * built-in edit metric, and it has no prefix weighting and no
  * normalized output).
  *
  * Semantics and float-op order are pinned to DuckDB's
  * `jaro_winkler_similarity` (see [[GraftKernels.jaroWinkler]] — fuzz
  * checked bit-exact, including the "both empty → 0.0" corner), so an
  * independent DuckDB replay reproduces the exact double, not an
  * approximation. Operates on UTF-8 bytes (= codepoints for ASCII).
  *
  * Codegen emits one static call into [[GraftKernels]], keeping the
  * O(l1·l2)-windowed scan inside whole-stage codegen with no boxing —
  * this sits in the inner loop of blocked entity-match joins, where
  * it runs once per candidate pair.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
