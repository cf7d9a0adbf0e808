package graft.functions

import org.apache.spark.sql.Column

/** Public facade for the native vector expressions (implementation in
  * org.apache.spark.sql.graftext — see that file for why). */
object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.dotProduct(a, b)
}
