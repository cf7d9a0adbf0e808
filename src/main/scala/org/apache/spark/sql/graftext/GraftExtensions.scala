package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Builder-time extension point: registers graft's native expressions
  * on every session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`.
  * (For an already-running session use VectorExpressions.register.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashes].getName, "rolling_hashes"),
      exprs => RollingHashes(exprs(0), exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("rolling_ngrams"),
      new ExpressionInfo(classOf[RollingNgrams].getName, "rolling_ngrams"),
      exprs => RollingNgrams(exprs(0), exprs(1).eval().asInstanceOf[Int])))
  }
}
