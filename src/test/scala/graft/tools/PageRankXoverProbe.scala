package graft.tools

import org.apache.spark.sql.SparkSession

/** Broadcast-vs-shuffle PageRank layout A/B above the crossover
  * (scratch, not part of the library): the r14 engine ships
  * `spark.graft.pagerank.broadcastNodesMax` = 4M spec-pinned for
  * EQUALITY but bench-unmeasured above the threshold — the 100 TB
  * story leaned on the untimed branch. Generates a deterministic
  * power-law graph over the ceiling (GenData.powerLawGraph), runs
  * interleaved A/B arms (A = broadcast layout forced, B = shuffle
  * layout) of pageRank(3), and prints one JSON line with per-rep
  * times. Env: XOVER_NODES (default 5_000_000), XOVER_DEG (4). */
object PageRankXoverProbe {
  def main(args: Array[String]): Unit = {
    val nNodes = sys.env.getOrElse("XOVER_NODES", "5000000").toLong
    val avgDeg = sys.env.getOrElse("XOVER_DEG", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the edge set ONCE outside the timed arms (both arms
    // re-checkpoint it inside buildGraph; what's timed is the ENGINE)
    val edges = graft.GenData.powerLawGraph(spark, nNodes, avgDeg).localCheckpoint()
    val nE = edges.count()
    val nN = edges.select("src").union(edges.select("dst")).distinct().count()
    System.err.println(s"[xover] graph: $nN nodes, $nE edges")

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => org.apache.spark.sql.graftext.GraftPins.isPinned(r.id))
        .filter(_.id > edges.rdd.id) // keep the shared input checkpoint
        .foreach(r => try r.unpersist(blocking = true) catch { case _: Throwable => () })
      System.gc()
    }
    def run(label: String, broadcastMax: Long): Double = {
      sweep()
      spark.conf.set("spark.graft.pagerank.broadcastNodesMax", broadcastMax.toString)
      val t0 = System.nanoTime()
      graft.ops.PageRankOp.pageRank(edges, "src", "dst", 3)
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[xover] $label $dt%.2f s")
      dt
    }
    // interleaved arms, 3 reps each
    val reps = (1 to 3).flatMap { _ =>
      Seq("broadcast" -> run("broadcast", nNodes + 1),
          "shuffle" -> run("shuffle", 0L))
    }
    val a = reps.filter(_._1 == "broadcast").map(_._2)
    val b = reps.filter(_._1 == "shuffle").map(_._2)
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"pagerank_xover","nodes":$nN,"edges":$nE,"iters":3,""" +
      s""""broadcast":${arr(a)},"shuffle":${arr(b)},""" +
      s""""broadcast_min":${f"${a.min}%.3f"},"shuffle_min":${f"${b.min}%.3f"}}""")
    spark.stop()
  }
}
