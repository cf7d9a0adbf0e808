package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity for the histogram-then-select exact-percentile formulation
  * (`a6_percentiles`): Spark's own `percentile()` aggregate implements
  * the same quantile_cont definition ((n-1)·p rank, linear
  * interpolation), so per-group p50/p95 must agree to float tolerance
  * on any input. Edge cases the bucketing must survive: single-row
  * groups, two-row groups, all-equal groups (vmax == vmin ⇒ one
  * bucket), and massive ties straddling would-be bucket boundaries.
  */
class PercentilesSpec extends SparkSpec {

  private def runOn(rows: Seq[(String, Double)]): Map[String, (Double, Double)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pctl").toString
    rows.toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    CoverageQueries.percentiles.run(spark, dir).collect()
      .map(r => r.getString(r.fieldIndex("l_returnflag")) ->
        (r.getDouble(r.fieldIndex("p50")), r.getDouble(r.fieldIndex("p95"))))
      .toMap
  }

  private def reference(rows: Seq[(String, Double)]): Map[String, (Double, Double)] = {
    import spark.implicits._
    rows.toDF("g", "v").groupBy($"g")
      .agg(percentile($"v", lit(0.5)).as("p50"), percentile($"v", lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
  }

  private def assertAgree(rows: Seq[(String, Double)]): Unit = {
    val got = runOn(rows)
    val want = reference(rows)
    assert(got.keySet === want.keySet)
    for (g <- want.keySet) {
      val ((g50, g95), (w50, w95)) = (got(g), want(g))
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      assert(close(g50, w50), s"$g p50: got $g50 want $w50")
      assert(close(g95, w95), s"$g p95: got $g95 want $w95")
    }
  }

  test("randomized parity with Spark's exact percentile()") {
    val rnd = new scala.util.Random(0xA6)
    val rows = Seq.tabulate(5000) { i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 1e6) / 100.0)
    }
    assertAgree(rows)
  }

  test("edge groups: n=1, n=2, all-equal, boundary-straddling ties") {
    val ties = Seq.fill(500)(("T", 10.0)) ++ Seq.fill(500)(("T", 20.0))
    val rows = Seq(("A", 3.14), ("B", 1.0), ("B", 2.0),
      ("C", 5.0), ("C", 5.0), ("C", 5.0)) ++ ties
    assertAgree(rows)
  }

  test("a7_moments power-sum formulas match Spark's stddev_pop/skewness") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val got = CoverageQueries.moments.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(r.fieldIndex("std_qty")),
        r.getDouble(r.fieldIndex("skew_qty")))).toMap
    val want = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(stddev_pop(col("l_quantity")).as("sd"), skewness(col("l_quantity")).as("sk"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet) {
      assert(math.abs(got(g)._1 - want(g)._1) < 1e-5, s"$g stddev: ${got(g)} vs ${want(g)}")
      assert(math.abs(got(g)._2 - want(g)._2) < 1e-5, s"$g skewness: ${got(g)} vs ${want(g)}")
    }
  }
}
