package graft.ops

import graft.SparkSpec
import graft.etl.Sinks
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Plan-level assertions for the two storage layouts that matter at
  * 100 TB: partitioned directories (pruning) and bucketed tables
  * (shuffle-free co-located joins). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy layout prunes non-matching partitions at scan time") {
    val dir = Files.createTempDirectory("pq-part").toString + "/t"
    val df = Seq(("201906", "a", 1), ("201906", "b", 2), ("201907", "c", 3))
      .toDF("yyyymm", "k", "v")
    Sinks.parquetPartitionedAppend(df, dir, Seq("yyyymm"))
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet
      .contains("yyyymm=201906"))

    val pruned = spark.read.parquet(dir).filter(col("yyyymm") === "201906")
    // the scan's partition filters must carry the predicate — pruning
    // happens at file listing, before any data is read
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("201906"),
      s"partition filter missing from scan:\n$scan")
    assert(pruned.count() == 2)
  }

  test("bucketed tables join without a shuffle exchange") {
    val n = 1000
    val a = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(n).select(col("id").as("k"), (col("id") * 3).as("vb"))
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")

    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    assert(joined.count() == n)

    val plan = joined.queryExecution.executedPlan
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = resolved.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"bucketed join should be shuffle-free, found ${shuffles.size} exchange(s)")
  }
}
