package graft.tools

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for x_textrank (scratch, not part of the
  * library): splits the row's time into corpus-side graph build
  * (tokenize → vocab gate → bigram edges) vs the PageRank rounds, and
  * prints the word-graph size — the scheduling-vs-exchange verdict the
  * ktruss probe taught us to take BEFORE changing any plan. */
object TextrankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val V = org.apache.spark.sql.graftext.VectorExpressions
    def docs = Tables.documents(spark, sfDir)

    def edgeSet(): DataFrame = {
      val base = docs.select(graft.text.TextAnalysis.tokens(col("text")).as("_toks"))
      val vocab = base.select(explode(V.md5Hashes60(col("_toks"))).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 5).select(col("h"))
        .localCheckpoint()
      val big = base.filter(size(col("_toks")) >= 2)
        .select(explode(arrays_zip(
          slice(V.md5Hashes60(col("_toks")), lit(1), size(col("_toks")) - 1),
          slice(V.md5Hashes60(col("_toks")), lit(2), size(col("_toks")) - 1))).as("bg"))
        .select(col("bg").getField("0").as("ha"), col("bg").getField("1").as("hb"))
        .filter(col("ha") =!= col("hb"))
      val gated = big
        .join(broadcast(vocab.select(col("h").as("ha"))), "ha")
        .join(broadcast(vocab.select(col("h").as("hb"))), "hb")
      gated.select(col("ha").as("src"), col("hb").as("dst"))
        .unionByName(gated.select(col("hb").as("src"), col("ha").as("dst")))
        .distinct()
    }

    def timed(label: String)(body: => Long): Unit =
      for (i <- 1 to 3) {
        System.gc()
        val t0 = System.nanoTime()
        val n = body
        println(f"$label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      }

    timed("edge_build_only") { edgeSet().queryExecution.toRdd.count() }
    // pre-materialized edges: what do the 3 rounds alone cost?
    val e = edgeSet().localCheckpoint()
    val nE = e.count()
    val nN = e.select(col("src")).distinct().count()
    println(s"word graph: $nN nodes, $nE directed edges")
    timed("pagerank_on_ck_edges") {
      graft.ops.PageRankOp.pageRank(e, "src", "dst", 3)
        .queryExecution.toRdd.count()
    }
    timed("full_textrank") {
      graft.corpus.Corpus.textRankKeywords(docs, minCount = 5L, k = 20, iters = 3)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
