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
    *
    * Determinism: products of doubles round differently across engines
    * at the decimal cast (Spark casts via the shortest string repr,
    * DuckDB rounds the exact binary value), so all arithmetic here is
    * done IN decimal: cast each raw 2-decimal column to DECIMAL(12,4)
    * first (where both engines agree), multiply exactly — (12,4)×(13,4)
    * stays within 38 digits in both — and quantize each product back to
    * scale 4 via round(x, 4), which is HALF_UP for positives in BOTH
    * engines (a downscale CAST would not do: Spark's rounds HALF_UP but
    * DuckDB's truncates toward zero). The sums are then exact and the
    * final double casts bit-identical.
    */
  val q1Agg: Q = Q(
    "q1_agg",
    (s, d) => {
      val one = lit(1).cast("decimal(12,4)")
      val ep = col("l_extendedprice").cast("decimal(12,4)")
      val disc = col("l_discount").cast("decimal(12,4)")
      val tax = col("l_tax").cast("decimal(12,4)")
      val discPrice = round(ep * (one - disc), 4)
      val charge = round(discPrice * (one + tax), 4)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,4)")).cast("double").as("sum_qty"),
          sum(ep).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order")
        )
    },
    Some("""
      WITH l AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS DECIMAL(12,4)) AS qty,
               CAST(l_extendedprice AS DECIMAL(12,4)) AS ep,
               CAST(l_discount AS DECIMAL(12,4)) AS disc,
               CAST(l_tax AS DECIMAL(12,4)) AS tax
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(qty) AS DOUBLE) AS sum_qty,
             CAST(SUM(ep) AS DOUBLE) AS sum_base_price,
             CAST(SUM(round(ep * (CAST(1 AS DECIMAL(12,4)) - disc), 4)) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(round(round(ep * (CAST(1 AS DECIMAL(12,4)) - disc), 4) * (CAST(1 AS DECIMAL(12,4)) + tax), 4)) AS DOUBLE) AS sum_charge,
             COUNT(*) AS count_order
      FROM l
      GROUP BY l_returnflag, l_linestatus
    """.stripMargin.trim)
  )

  /** Distributive-aggregate merge — incremental materialized-view
    * maintenance: fold a delta partition's aggregate table into the
    * standing one without touching raw history. Sound exactly for the
    * distributive algebra (COUNT and SUM re-sum, MIN/MAX re-extremize;
    * AVG must be carried as sum+cnt, exact DISTINCT cannot be merged
    * at all — ship a sketch like [[Hll]] for that), so each non-key
    * column must DECLARE its algebra in its name: `cnt`/`cnt_*`/
    * `sum_*` re-sum, `min_*`/`max_*` re-extremize; anything else
    * fails fast rather than merging wrongly.
    *
    * One union of two agg-sized tables + one map-side-combined
    * re-aggregation — at 100 TB the raw data is never re-read; that
    * is the entire point. Carry SUMs as DECIMAL so the re-sum is
    * order-independent (the [[dsum]] discipline). */
  def mergeDistributive(prev: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeDistributive: need at least one key")
    require(prev.columns.toSeq == delta.columns.toSeq,
      s"mergeDistributive: schema mismatch ${prev.columns.toSeq} vs ${delta.columns.toSeq}")
    val aggs = prev.columns.filterNot(keys.contains).map { c =>
      if (c == "cnt" || c.startsWith("cnt_") || c.startsWith("sum_")) sum(col(c)).as(c)
      else if (c.startsWith("min_")) min(col(c)).as(c)
      else if (c.startsWith("max_")) max(col(c)).as(c)
      else throw new IllegalArgumentException(
        s"mergeDistributive: column '$c' does not declare a mergeable algebra " +
          "(cnt/cnt_*/sum_* re-sum, min_*/max_* re-extremize)")
    }
    require(aggs.nonEmpty, "mergeDistributive: no aggregate columns to merge")
    prev.unionAll(delta).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def all: Seq[Q] = Seq(q1Agg)
}
