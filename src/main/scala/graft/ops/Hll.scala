package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct counting (Flajolet et al. 2007)
  * over the engine-portable md5-60 hash family — the mergeable-sketch
  * answer to grouped COUNT(DISTINCT) at scale.
  *
  * Why a sketch: exact grouped count-distinct shuffles every distinct
  * (group, key) pair — at 100 TB that exchange carries billions of
  * rows. The HLL register table is m=2^p rows per group REGARDLESS of
  * cardinality, and register max is an associative-commutative merge,
  * so Spark's partial aggregation combines registers map-side and the
  * exchange carries ≤ m rows per group per partition. (Spark's own
  * approx_count_distinct is the same idea with a non-portable hash —
  * this one is replayable in any engine with md5 and bin().)
  *
  * Construction (p=8, m=256 registers): h = 60-bit md5 of the key
  * string; bucket = top 8 bits (h div 2^52); w = low 52 bits; rho =
  * 53 − bitlength(w) (bitlength via the bin() string, identical in
  * Spark and DuckDB; w=0 → rho=53). Register M_j = max rho. Estimate
  * E = alpha_256 · m² / Σ 2^(−M_j), with absent registers counting
  * 2^0. The harmonic sum runs in EXACT integer units of 2^(−53):
  * Σ 2^(53−M_j) ≤ m·2^53 = 2^61 fits BIGINT; the only roundings are
  * the final BIGINT→DOUBLE cast and one IEEE division (alpha is the
  * literal expression 0.7213/(1+1.079/256), evaluated identically on
  * both engines; multiplying by 2^53 and m²=2^16 are exact power-of-two
  * scalings). NO small-range correction: linear counting needs ln,
  * which the determinism contract bans — callers stay in the raw
  * regime (true cardinality ≳ 2.5·m = 640 per group; the catalog entry
  * has ≈7300 per group at sf0.01, growing with SF).
  *
  * Output: the group columns, `exact_distinct` (computed alongside —
  * at catalog scale it doubles as the visible-error baseline),
  * `hll_distinct` (the estimate, 6 dp), `n_buckets_hit`.
  */
object Hll {
  private val TwoTo53 = 9007199254740992L

  def hllDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    require(groupCols.nonEmpty, "hllDistinct: need at least one group column")
    val g = groupCols.map(col)
    val h = conv(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val hashed = df.select(g :+ h.as("_h"): _*)
      .select(g ++ Seq(
        // integer div/mod — a double division here would round-flip
        // bucket boundaries for h > 2^53
        expr(s"_h div ${1L << 52}").as("_bucket"),
        expr(s"_h % ${1L << 52}").as("_w")): _*)
      .select(g ++ Seq(col("_bucket"),
        when(col("_w") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("_w")))).as("_rho")): _*)
    val regs = hashed.groupBy((g :+ col("_bucket")): _*)
      .agg(max(col("_rho")).as("_mj"))
    val sk = regs.groupBy(g: _*)
      .agg(count(lit(1)).as("n_buckets_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - _mj)")).cast("bigint").as("_sp"))
      .select(g ++ Seq(col("n_buckets_hit"),
        (col("_sp") + (lit(256L) - col("n_buckets_hit")) * lit(TwoTo53)).as("_s")): _*)
      .select(g ++ Seq(col("n_buckets_hit"),
        round(
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
            lit(TwoTo53.toDouble) / col("_s").cast("double"),
          6).as("hll_distinct")): _*)
    val exact = df.groupBy(g: _*)
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    exact.join(sk, groupCols)
  }
}
