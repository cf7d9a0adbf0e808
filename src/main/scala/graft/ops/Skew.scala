package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * When one join key dominates (a "hot" customer, a null-heavy key),
  * the task holding that key becomes the straggler. Salting fans the
  * hot key's rows across `nSalts` partitions: the fact side gets a
  * deterministic per-row salt, the dim side is replicated once per
  * salt value, and the join key becomes (key, salt).
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin.enabled, on by
  * default) solves the sort-merge case at runtime; explicit salting
  * remains the tool for hash aggregations and for engines/paths AQE
  * doesn't cover — and it composes with any join type.
  */
object Skew {

  /** Deterministic per-row salt in [0, nSalts): hashes the salt-by
    * columns (e.g. a unique row id) rather than calling rand(), so
    * retried tasks produce identical output — a correctness requirement
    * under speculative execution. */
  def salt(nSalts: Int, saltBy: Column*): Column =
    pmod(xxhash64(saltBy: _*), lit(nSalts.toLong)).cast("int")

  /** fact ⋈ dim on fact(key) = dim(key), salted nSalts ways.
    * dim is replicated ×nSalts via a literal-range explode (cheap: dim
    * is the small side by assumption). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 nSalts: Int, factSaltBy: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      salt(nSalts, factSaltBy.map(col): _*))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
