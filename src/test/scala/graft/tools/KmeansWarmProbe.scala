package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-vs-warm timing of the semcents clustering (scratch): runs the
  * exact coSemCentroids call — Similarity.kmeans(embeddings, 4, 64, 2)
  * — twice in one session on the checkpointed embeddings table. The
  * face builds ONCE per session (single-shot bill in full legs), so
  * the delta between run 1 and run 2 is the plan codegen/JIT warmup
  * share of the face:semcents metric, not recomputable structure.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1). */
object KmeansWarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir).localCheckpoint()
    emb.count()
    val times = (1 to 3).map { r =>
      spark.sparkContext.setJobDescription(s"semcents kmeans run $r")
      val t0 = System.nanoTime()
      graft.sim.Similarity.kmeans(emb, nLists = 4, dim = 64, iters = 2)
      (System.nanoTime() - t0) / 1e9
    }
    println("{\"metric\":\"kmeans_warm\",\"sf\":\"" + sfDir + "\",\"runs\":[" +
      times.map(t => f"$t%.3f").mkString(",") + "]}")
    spark.stop()
  }
}
