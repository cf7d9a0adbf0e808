package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity.semanticSample contract: at most perCluster per cluster,
  * every non-empty cluster represented, deterministic across runs, and
  * perCluster ≥ occupancy degenerates to the identity (all rows, with
  * their cluster ids). */
class SemanticSampleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    graft.Tables.embeddings(spark, sfDir)
  }

  test("caps every cluster at perCluster and covers every non-empty cluster") {
    val out = Similarity.semanticSample(emb, perCluster = 7, dim = 64, nClusters = 4)
      .select(col("vec_id"), col("list")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val perCluster = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perCluster.values.forall(_ <= 7), s"cluster over cap: $perCluster")
    // replay assignment to find which clusters are non-empty
    val cents = Similarity.kmeans(emb, nLists = 4, dim = 64, iters = 2)
    val nonEmpty = emb
      .select(Similarity.kmeansAssignLiteral(
        col("embedding").cast("array<double>"), cents).as("list"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(perCluster.keySet == nonEmpty,
      s"sampled clusters ${perCluster.keySet} != non-empty $nonEmpty")
  }

  test("deterministic across runs") {
    def run() = Similarity.semanticSample(emb, perCluster = 5, dim = 64, nClusters = 4)
      .select(col("vec_id"), col("list")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(run() == run())
  }

  test("perCluster >= occupancy keeps every row with its cluster id") {
    val n = emb.count().toInt
    val out = Similarity.semanticSample(emb, perCluster = n, dim = 64, nClusters = 4)
    assert(out.count() == n)
    assert(out.columns.contains("list"))
  }
}
