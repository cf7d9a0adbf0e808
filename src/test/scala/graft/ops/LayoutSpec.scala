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

  test("persisted IVF index: a probe scans only its list partitions") {
    import graft.sim.Similarity
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (((seed * 31 + i * 17) % 13) - 6).toFloat / 6f)
    val emb = (0 until 64).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("ivf-layout").toString
    Similarity.saveIndexIvf(emb, dim = 8, dir, nLists = 4, iters = 2)
    // the at-rest layout IS list-directories
    val listDirs = new java.io.File(s"$dir/lists").listFiles()
      .map(_.getName).filter(_.startsWith("list=")).toSet
    assert(listDirs.size >= 2, s"expected list=<j> partition dirs, got $listDirs")
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probe = Similarity.knnJoinIvfPersisted(spark, dir, queries, k = 3)
    // single query, nprobe=1 → exactly one list partition reaches the scan
    val scans = probe.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val listScan = scans.find(s => s.contains(s"$dir/lists") || s.contains("list#"))
      .getOrElse(fail(s"no scan over the list partitions in:\n${scans.mkString("\n")}"))
    val pfIdx = listScan.indexOf("PartitionFilters: [")
    assert(pfIdx >= 0 && !listScan.substring(pfIdx + 19).trim.startsWith("]"),
      s"probe must push a NON-EMPTY filter on the partition column:\n$listScan")
    assert(probe.count() == 3)
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
