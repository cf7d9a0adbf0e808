package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the distributive-aggregate merge: the merge of
  * two partition aggregates must equal the direct aggregation of the
  * union (the MV-maintenance law), and columns that don't declare a
  * mergeable algebra must fail fast instead of merging wrongly.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(
      count(lit(1)).as("cnt"),
      sum(col("v").cast("decimal(18,4)")).as("sum_v"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))

  test("merge of partition aggregates equals the direct aggregation") {
    val rows = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", 4.0), ("b", -1.0), ("c", 7.0))
    val df = rows.toDF("k", "v")
    // deterministic split: first 3 rows vs last 3
    val p1 = aggOf(rows.take(3).toDF("k", "v"))
    val p2 = aggOf(rows.drop(3).toDF("k", "v"))
    val merged = Relational.mergeDistributive(p1, p2, Seq("k"))
    assert(rowSet(merged) == rowSet(aggOf(df)), s"merged=${rowSet(merged)}")
    // a key present in only one partition survives untouched
    assert(merged.filter(col("k") === "c").count() == 1)
  }

  test("a column without a declared algebra fails fast") {
    val a = Seq(("a", 1.0)).toDF("k", "v").groupBy("k").agg(avg("v").as("avg_v"))
    val e = intercept[IllegalArgumentException] {
      Relational.mergeDistributive(a, a, Seq("k"))
    }
    assert(e.getMessage.contains("avg_v"))
  }

  test("exactNtile: NTILE definition — first n mod b buckets take the extra row") {
    // 7 rows, 3 buckets: base=2, rem=1 → sizes 3,2,2 in rank order
    val df = Seq((10, "a"), (20, "b"), (30, "c"), (40, "d"), (50, "e"), (60, "f"), (70, "g"))
      .toDF("v", "id")
    val out = Relational.exactNtile(df, 3, Seq("v", "id"), "bucket")
    val got = out.select(col("id"), col("bucket")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 2L, "f" -> 3L, "g" -> 3L))
  }

  test("exactNtile: n < buckets degenerates to rank; reserved-column collision fails fast") {
    val df = Seq((5, "x"), (1, "y")).toDF("v", "id")
    val out = Relational.exactNtile(df, 5, Seq("v", "id"), "b")
    assert(rowSet(out.select(col("id"), col("b"))) == Set("1|y", "2|x"))
    val e = intercept[IllegalArgumentException] {
      Relational.exactNtile(df.withColumn("b", lit(0)), 5, Seq("v"), "b")
    }
    assert(e.getMessage.contains("'b'"))
  }

  test("bitmapDistinct: exact distinct counts and word occupancy across the 32-bit boundary") {
    val df = Seq(("a", 0L), ("a", 1L), ("a", 31L), ("a", 31L), ("a", 32L),
      ("b", 64L), ("b", 64L)).toDF("g", "uid")
    val out = Relational.bitmapDistinct(df, "g", "uid")
    // group a: ids {0,1,31} share word 0, {32} is word 1 → 2 words, 4 distinct
    assert(rowSet(out) == Set("a|4|2", "b|1|1"))
  }

  test("calendarFillDaily: interior gap days materialize as explicit zero rows") {
    val orders = Seq(
      (1L, "2024-01-01", "1-URGENT", 10.50),
      (2L, "2024-01-04", "1-URGENT", 4.25),
      (3L, "2024-01-04", "2-HIGH", 1.00))
      .toDF("o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    val out = Relational.calendarFillDaily(orders)
    // spine = 4 days × 2 priorities = 8 rows, 3 observed + 5 zero-filled
    assert(out.count() == 8)
    assert(out.filter(col("n_orders") === 0 && col("revenue") === 0.0).count() == 5)
    assert(rowSet(out.filter(col("day") === "2024-01-04")) ==
      Set("2024-01-04|1|1-URGENT|4.25", "2024-01-04|1|2-HIGH|1.0"))
  }

  test("ltvCohort: offsets are exact month diffs; cumulative revenue runs within cohort") {
    val orders = Seq(
      (1L, "2024-01-15", "x", 10.0), (1L, "2024-03-02", "x", 20.0),
      (2L, "2024-03-20", "x", 5.0))
      .toDF("o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    val out = Relational.ltvCohort(orders)
    // cols sorted: cohort_month|cum_revenue|month_offset|n_active|revenue
    assert(rowSet(out) == Set(
      "2024-01|10.0|0|1|10.0", "2024-01|30.0|2|1|20.0", "2024-03|5.0|0|1|5.0"))
  }

  test("rfmSegments: quintile orientation (1 = most recent / least frequent / least value)") {
    val orders = Seq(
      (1L, "2024-01-10", 100.0), (1L, "2024-01-10", 100.0),
      (2L, "2024-01-01", 500.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rfmSegments(orders)
    // cust1: rec=0 freq=2 $200 → (r,f,m)=(1,2,1); cust2: rec=9 freq=1 $500 → (2,1,2)
    assert(rowSet(out) == Set("2|1|1|1|200.0", "1|2|1|2|500.0"))
  }
}
