package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator catalog over the TPC-H-ish tables.
  *
  * Determinism rules (the driver hash-compares against a DuckDB oracle):
  *   - double SUM/AVG is order-dependent → cast each addend to
  *     DECIMAL(18,4) (exact arithmetic, associative) and cast the final
  *     result to DOUBLE in BOTH engines;
  *   - DuckDB SUM(integer) returns HUGEINT → CAST(... AS BIGINT) in the
  *     oracle to match Spark's LongType;
  *   - aliases must be byte-identical on both sides.
  */
object Relational {

  /** Exact decimal sum of a double expression, surfaced as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** q1_agg — TPC-H Q1 shape: scan-heavy groupBy aggregation on
    * lineitem. At 100 TB this is a map-side partial agg + one shuffle on
    * (returnflag, linestatus) — 6 groups, so the reduce side is trivial;
    * all heavy lifting stays in whole-stage codegen over the scan.
    */
  val q1Agg: Q = Q(
    "q1_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order")
        )
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,4))) AS DOUBLE) AS sum_charge,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """.stripMargin.trim)
  )

  def all: Seq[Q] = Seq(q1Agg)
}
