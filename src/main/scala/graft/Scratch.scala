package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for local iteration (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    import graft.dedup.Dedup
    time("warmup pass") {
      docs.select(Dedup.shingleHashes(col("text")).as("h")).queryExecution.toRdd.count()
    }
    time("shingleHashes") {
      docs.select(Dedup.shingleHashes(col("text")).as("h")).queryExecution.toRdd.count()
    }
    time("explode hashes") {
      docs.select(col("doc_id"), explode(Dedup.shingleHashes(col("text"))).as("g"))
        .queryExecution.toRdd.count()
    }
    time("signatures (64 min-aggs)") {
      Dedup.minhashSignatures(docs).queryExecution.toRdd.count()
    }
    time("buckets") {
      Dedup.lshBuckets(docs).queryExecution.toRdd.count()
    }
    time("full minhashNearDups") {
      Dedup.minhashNearDups(docs, threshold = 0.5).queryExecution.toRdd.count()
    }
    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, threshold = 0.05).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
