package graft.functions

import org.apache.spark.sql.Column

/** Public facade for the native vector expressions (implementation in
  * org.apache.spark.sql.graftext — see that file for why). */
object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.VectorExpressions.dotProduct(a, b)

  /** Native rolling-window xxhash64 fingerprints of a token array. */
  def rollingHashes(tokens: Column, w: Int): Column =
    org.apache.spark.sql.graftext.VectorExpressions.rollingHashes(tokens, w)

  /** Expose both as SQL functions (dot_product, rolling_hashes). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftext.VectorExpressions.register(spark)
}
