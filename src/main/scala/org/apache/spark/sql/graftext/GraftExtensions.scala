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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.functions.foreach { case (name, cls, builder) =>
      val info = GraftFunctionRegistry.usages.get(name) match {
        case Some(usage) => new ExpressionInfo(cls.getName, null, name, usage, "")
        case None => new ExpressionInfo(cls.getName, name)
      }
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
