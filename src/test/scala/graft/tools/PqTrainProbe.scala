package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serial-vs-fused PQ codebook training A/B (scratch, not part of the
  * library): times `Similarity.savePqIndex` (train + encode + write,
  * the face:pqindex_saved bill) and a single `annPq` probe (the
  * x_ann_pq shape) under both `spark.graft.pq.fusedTrain` settings,
  * interleaved reps, on the CATALOG's embeddings table and parameters
  * (dim 64, m 8, nCents 16, iters 2). Prints one JSON line with
  * per-rep times. Env: SPARK_GRAFT_SF_DIR (default sf0.1), PQ_REPS
  * (default 3). */
object PqTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("PQ_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the catalog's embeddings table, checkpointed once so both arms
    // time TRAINING, not the parquet scan (the coEmbeddings face shape)
    val emb = graft.Tables.embeddings(spark, sfDir).localCheckpoint()
    emb.count()

    def timeIt(label: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(label)
      System.gc()
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      dt
    }
    def runSave(): Unit = {
      val path = java.nio.file.Files.createTempDirectory("pq-ab").toString
      try graft.sim.Similarity.savePqIndex(emb, dim = 64, path, m = 8,
        nCents = 16, iters = 2)
      finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(path)).deleteRecursively(); ()
      }
    }
    def runAnn(): Unit =
      graft.sim.Similarity.annPq(emb, queryId = 0L, dim = 64, k = 20,
        m = 8, nCents = 16, iters = 2)
        .write.format("noop").mode("overwrite").save()

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for (arm <- Seq("serial", "fused")) // warm both paths once (JIT)
      { spark.conf.set("spark.graft.pq.fusedTrain", (arm == "fused").toString); runAnn() }
    for (what <- Seq("save", "ann")) {
      val times = scala.collection.mutable.Map("serial" -> Vector.empty[Double],
        "fused" -> Vector.empty[Double])
      for (r <- 1 to reps; arm <- Seq("serial", "fused")) {
        spark.conf.set("spark.graft.pq.fusedTrain", (arm == "fused").toString)
        val t = timeIt(s"$what/$arm rep $r")(if (what == "save") runSave() else runAnn())
        times(arm) = times(arm) :+ t
      }
      out(s"${what}_serial") = times("serial"); out(s"${what}_fused") = times("fused")
    }
    spark.conf.unset("spark.graft.pq.fusedTrain")
    val js = out.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{\"metric\":\"pq_train_ab\",\"sf\":\"" + sfDir + "\",", ",", "}")
    println(js)
    spark.stop()
  }
}
