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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "128"))
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
    import org.apache.spark.sql.graftext.VectorExpressions
    time("SparkEntry.entry smoke") {
      SparkEntry.entry(spark).queryExecution.toRdd.count()
    }
    time("warmup pass2") {
      graft.SparkEntry.queries("a6_percentiles")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("a6 warm") {
      graft.SparkEntry.queries("a6_percentiles")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("warmup pass") {
      docs.select(Dedup.shingleHashes(col("text")).as("h")).queryExecution.toRdd.count()
    }
    time("shingles (native)") {
      docs.select(Dedup.shingles(col("text")).as("s")).queryExecution.toRdd.count()
    }
    time("fp_md5 only") {
      docs.select(md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("f"))
        .queryExecution.toRdd.count()
    }
    time("md5Min(shingles)") {
      docs.select(VectorExpressions.md5Min(Dedup.shingles(col("text"))).as("m"))
        .queryExecution.toRdd.count()
    }
    time("n_windows only") {
      docs.select(size(graft.text.TextAnalysis.rollingFingerprints(col("text"))).as("n"))
        .queryExecution.toRdd.count()
    }
    time("md5MinHash(shingles, 8)") {
      docs.select(VectorExpressions.md5MinHash(Dedup.shingles(col("text")), 8).as("s"))
        .queryExecution.toRdd.count()
    }
    val sigs = docs.select(col("doc_id"), posexplode(
      VectorExpressions.md5MinHash(Dedup.shingles(col("text")), 8)).as(Seq("j", "s")))
    time("sigs exploded") { sigs.queryExecution.toRdd.count() }
    time("sigs grouped") {
      sigs.groupBy(col("j"), col("s")).agg(collect_list(col("doc_id")).as("ids"))
        .queryExecution.toRdd.count()
    }
    val cand = {
      val grouped = sigs.groupBy(col("j"), col("s")).agg(collect_list(col("doc_id")).as("ids"))
      grouped.filter(size(col("ids")) > 1)
        .select(explode(filter(
          flatten(transform(col("ids"),
            x => transform(col("ids"), y => struct(x.as("id1"), y.as("id2"))))),
          p => p("id1") < p("id2"))).as("p"))
        .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
        .dropDuplicates()
    }
    time("candidates+dedup") { cand.queryExecution.toRdd.count() }
    time("full minhashNearDupsMd5") {
      Dedup.minhashNearDupsMd5(docs, threshold = 0.5).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
