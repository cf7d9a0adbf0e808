package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics of Similarity.semanticDedup (SemDeDup-style): kept = rows
  * with no lower-id clustermate at cos ≥ t. Pinned four ways: exact
  * duplicates collapse to the lowest id, an impossible threshold keeps
  * everything, the cluster-size fuse fails conservative (keeps all),
  * and the full operator agrees with an independently-computed
  * brute-force replay of the same rule on real sf0.001 embeddings. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def keptIds(df: DataFrame): Set[Long] =
    df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

  /** 3 exact-duplicate groups planted among axis-ish distinct vectors. */
  private def dupEmb = {
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (((seed * 31 + i * 17) % 13) - 6).toFloat / 6f)
    val rows = Seq(
      (0L, v(1)), (1L, v(1)), (7L, v(1)),   // dup group -> keep 0
      (2L, v(7)), (5L, v(7)),               // dup group -> keep 2
      (3L, v(11)), (4L, v(23)), (6L, v(5))) // singletons -> all kept
    rows.toDF("vec_id", "embedding")
  }

  test("exact duplicates collapse to the lowest id per group") {
    val kept = keptIds(Similarity.semanticDedup(dupEmb, threshold = 0.999,
      dim = 8, nClusters = 2, iters = 1))
    assert(kept.contains(0L) && !kept.contains(1L) && !kept.contains(7L))
    assert(kept.contains(2L) && !kept.contains(5L))
    assert(Set(3L, 4L, 6L).subsetOf(kept))
  }

  test("threshold above 1 keeps every row") {
    val kept = keptIds(Similarity.semanticDedup(dupEmb, threshold = 1.5,
      dim = 8, nClusters = 2, iters = 1))
    assert(kept == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("oversized clusters skip dedup (conservative fuse): cap=1 keeps all") {
    val kept = keptIds(Similarity.semanticDedup(dupEmb, threshold = 0.999,
      dim = 8, nClusters = 2, iters = 1, maxClusterSize = 1))
    assert(kept == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("scoreCol keep policy: the highest-score twin survives, not the lowest id") {
    val scored = dupEmb.withColumn("quality",
      // give the HIGHEST id of each dup group the best score
      col("vec_id").cast("double"))
    val kept = keptIds(Similarity.semanticDedup(scored, threshold = 0.999,
      dim = 8, nClusters = 2, iters = 1, scoreCol = Some("quality")))
    // dup groups {0,1,7} and {2,5}: score = id, so 7 and 5 survive
    assert(kept.contains(7L) && !kept.contains(0L) && !kept.contains(1L))
    assert(kept.contains(5L) && !kept.contains(2L))
    assert(Set(3L, 4L, 6L).subsetOf(kept))
  }

  test("adaptiveNClusters: ceil(n / targetOccupancy), floored at 1") {
    assert(Similarity.adaptiveNClusters(0L) == 1)
    assert(Similarity.adaptiveNClusters(4096L) == 1)
    assert(Similarity.adaptiveNClusters(4097L) == 2)
    assert(Similarity.adaptiveNClusters(100_000_000L, targetOccupancy = 9000) == 11112)
    intercept[IllegalArgumentException](Similarity.adaptiveNClusters(10L, 0))
  }

  test("semanticDedupLshBackstop with scoreCol: the highest-score twin survives") {
    val scored = dupEmb.withColumn("quality", col("vec_id").cast("double"))
    val kept = keptIds(Similarity.semanticDedupLshBackstop(scored,
      threshold = 0.999, dim = 8, nClusters = 2, iters = 1,
      scoreCol = Some("quality")))
    assert(kept.contains(7L) && !kept.contains(0L) && !kept.contains(1L))
    assert(kept.contains(5L) && !kept.contains(2L))
    assert(Set(3L, 4L, 6L).subsetOf(kept))
  }

  test("semanticDedupLshBackstop = semanticDedup drops ∪ LSH-pair drops on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val emb = graft.Tables.embeddings(spark, sfDir)
    val t = 0.3
    val semKept = keptIds(Similarity.semanticDedup(emb, threshold = t, dim = 64,
      nClusters = 4, iters = 2))
    // independent union replay: the LSH verified pairs drop their id2
    val lshDrops = Similarity.cosineNearDupsLsh(emb, threshold = t)
      .select(col("id2")).collect().map(_.getLong(0)).toSet
    val kept = keptIds(Similarity.semanticDedupLshBackstop(emb, threshold = t,
      dim = 64, nClusters = 4, iters = 2))
    assert(kept == (semKept -- lshDrops))
    assert(kept.size < semKept.size || lshDrops.subsetOf(
      emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet -- semKept),
      "backstop added nothing on this corpus AND lsh drops were not already dropped — vacuous")
  }

  test("agrees with a brute-force replay of the drop rule on sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val emb = graft.Tables.embeddings(spark, sfDir)
    val t = 0.3
    val cents = Similarity.kmeans(emb, nLists = 3, dim = 64, iters = 2)
    // independent replay: literal-column assignment + O(n^2) pair scan
    val v = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("list", Similarity.kmeansAssignLiteral(col("v"), cents))
    val a = v.select(col("id").as("i"), col("v").as("vi"), col("list"))
    val b = v.select(col("id").as("j"), col("v").as("vj"), col("list"))
    val dropped = a.join(b, "list").filter(col("i") < col("j"))
      .filter(Similarity.dot(col("vi"), col("vj")) /
        (Similarity.norm(col("vi")) * Similarity.norm(col("vj"))) >= t)
      .select(col("j")).distinct().collect().map(_.getLong(0)).toSet
    val allIds = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val kept = keptIds(Similarity.semanticDedup(emb, threshold = t, dim = 64,
      nClusters = 3, iters = 2))
    assert(kept == (allIds -- dropped))
    assert(dropped.nonEmpty, "replay dropped nothing — test not exercising the rule")
  }
}
