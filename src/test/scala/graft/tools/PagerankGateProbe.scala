package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed-vs-driver A/B for the purchase-graph PageRank rows
  * (scratch): x_pagerank/x_ppr's bipartite graph sits just above the
  * 10k-node tiny gate at sf0.1, so it rides the round engine there
  * while x_textrank's word graph took the driver path. Interleaved
  * reps of the exact x_pagerank and x_ppr bodies under
  * spark.graft.pagerank.tinyGraphMaxNodes = 10k (engine) vs a value
  * above the graph size (driver iteration), plus the graph's
  * node/edge counts. Prints one JSON line.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), GATE_REPS (default 3),
  * GATE_TINYMAX (default 200000). */
object PagerankGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GATE_REPS", "3").toInt
    val tinyMax = sys.env.getOrElse("GATE_TINYMAX", "200000")
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

    def edges = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val eCk = edges.localCheckpoint()
    val nE = eCk.count()
    val nN = eCk.select(col("src").as("n")).union(eCk.select(col("dst"))).distinct().count()
    System.err.println(s"[gate] purchase graph: $nN nodes, $nE edges")

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => org.apache.spark.sql.graftext.GraftPins.isPinned(r.id))
        .filter(_.id > eCk.rdd.id)
        .foreach(r => try r.unpersist(blocking = true) catch { case _: Throwable => () })
      System.gc()
    }
    def runOnce(what: String): Double = {
      sweep()
      val t0 = System.nanoTime()
      val out = what match {
        case "pagerank" => graft.ops.PageRankOp.pageRank(eCk, "src", "dst", iters = 3)
        case _ =>
          val seeds = graft.Tables.orders(spark, sfDir)
            .select((col("o_custkey") * 2).as("node"))
            .filter(col("node") % 20 === 0).distinct()
          graft.ops.PageRankOp.personalizedPageRank(eCk, "src", "dst", seeds, iters = 3)
      }
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (JIT)
    for (g <- Seq("10000", tinyMax)) {
      spark.conf.set("spark.graft.pagerank.tinyGraphMaxNodes", g); runOnce("pagerank")
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for (what <- Seq("pagerank", "ppr")) {
      val t = scala.collection.mutable.Map("engine" -> Vector.empty[Double],
        "driver" -> Vector.empty[Double])
      for (r <- 1 to reps; arm <- Seq("engine", "driver")) {
        spark.conf.set("spark.graft.pagerank.tinyGraphMaxNodes",
          if (arm == "engine") "10000" else tinyMax)
        spark.sparkContext.setJobDescription(s"$what/$arm rep $r")
        t(arm) = t(arm) :+ runOnce(what)
      }
      out(s"${what}_engine") = t("engine"); out(s"${what}_driver") = t("driver")
    }
    spark.conf.unset("spark.graft.pagerank.tinyGraphMaxNodes")
    val js = out.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(x => f"$x%.3f").mkString(",") + "]"
    }.mkString("{\"metric\":\"pagerank_gate_ab\",\"sf\":\"" + sfDir +
      "\",\"nodes\":" + nN + ",\"edges\":" + nE + ",", ",", "}")
    println(js)
    spark.stop()
  }
}
