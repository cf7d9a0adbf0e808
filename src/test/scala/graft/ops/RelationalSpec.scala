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
}
