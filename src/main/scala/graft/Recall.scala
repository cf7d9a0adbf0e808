package graft

import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall measurement for the approximate retrieval family against
  * their exact twins, at the CATALOG's own parameters — the committed
  * numbers live in RECALL.md. Run per scale factor:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Recall"
  *
  * - kNN joins: recall@k = |approx ∩ exact top-k| / |exact top-k| over
  *   the fixed 40-query eval set (ties broken by id on both sides, so
  *   the intersection is well-defined).
  * - near-dup pairs: pair recall = |LSH pairs ∩ exact pairs| / |exact
  *   pairs| for the O(n²) brute-force pair set at the same threshold.
  */
object Recall {
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

    // SPARK_GRAFT_RECALL_SECTIONS=pq (comma-separated of knn,pq,lsh,
    // semdedup) restricts a run to the named measurement blocks — each
    // block's exact-twin target is the expensive part, so an iteration
    // on one operator family shouldn't pay for all four.
    val sections = sys.env.get("SPARK_GRAFT_RECALL_SECTIONS")
      .map(_.split(",").map(_.trim).toSet)
    def sec(name: String): Boolean = sections.forall(_.contains(name))

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val k = 5
    val queries = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    def knnSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    lazy val exactKnn = knnSet(Similarity.knnJoin(emb, queries, k = k))
    def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else approx.intersect(exact).size.toDouble / exact.size

    val rows = scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    if (sec("knn")) {
    rows += (("knnJoinLsh nBits=6 (x_knn_join_lsh)", k,
      recall(knnSet(Similarity.knnJoinLsh(emb, queries, dim = 64, k = k, nBits = 6)),
        exactKnn)))
    rows += (("knnJoinLshMultiBand nBands=8 adaptive-b@target64 (x_knn_join_lsh_mb)", k,
      recall(knnSet(Similarity.knnJoinLshMultiBand(emb, queries, dim = 64, k = k,
        nBands = 8)), exactKnn)))
    // the adaptive band count (nBands=0): holds recall as n grows by
    // growing the OR-construction ≈ √n (adaptiveNBands scaladoc)
    val adaptiveBands = Similarity.adaptiveNBands(n)
    rows += ((s"knnJoinLshMultiBand ADAPTIVE nBands=$adaptiveBands (nBands=0)", k,
      recall(knnSet(Similarity.knnJoinLshMultiBand(emb, queries, dim = 64, k = k)),
        exactKnn)))
    for (np <- Seq(1, 2, 4))
      rows += ((s"knnJoinIvf nLists=4 nprobe=$np" +
        (if (np == 1) " (x_knn_join_ivf)" else if (np == 2) " (x_knn_join_ivf_mp)" else ""), k,
        recall(knnSet(Similarity.knnJoinIvf(emb, queries, dim = 64, k = k,
          nLists = 4, iters = 2, nprobe = np)), exactKnn)))
    val idx = java.nio.file.Files.createTempDirectory("recall-ivf").toString
    Similarity.saveIndexIvf(emb, dim = 64, idx, nLists = 4, iters = 2)
    rows += (("knnJoinIvfPersisted nprobe=1 (x_knn_join_ivf_persisted)", k,
      recall(knnSet(Similarity.knnJoinIvfPersisted(spark, idx, queries, k = k)), exactKnn)))
    }

    // PQ-ADC retrieval vs its OWN objective (exact L2 top-k — PQ
    // approximates squared euclidean, not cosine; on unnormalized
    // vectors the two top-k sets differ, so grading ADC against the
    // cosine eval set would conflate quantization error with metric
    // mismatch). Exact L2 ranks are computed driver-side from the
    // collected vectors — measurement-only, like the O(n²) pair maps
    // above. 10 queries: annPq builds one codebook+LUT per call.
    if (sec("pq")) {
      val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      def l2(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      val pqQids = (0L until 10L).filter(vecs.contains)
      val exactL2 = pqQids.flatMap { qid =>
        vecs.iterator.filter(_._1 != qid).toSeq
          .sortBy { case (id, v) => (l2(vecs(qid), v), id) }.take(k)
          .map { case (id, _) => (qid, id) }
      }.toSet
      val pqSet = pqQids.flatMap { qid =>
        Similarity.annPq(emb, qid, dim = 64, k = k, m = 8, nCents = 16, iters = 2)
          .collect().map(r => (qid, r.getLong(0)))
      }.toSet
      rows += ((s"annPq m=8 nCents=16 vs exact-L2 (x_ann_pq), ${pqQids.size} queries", k,
        recall(pqSet, exactL2)))
      // the deployment shape: ADC produces a SHORTLIST (8·k here), the
      // exact vectors rescore it — recall = how often the true top-k
      // survives into the shortlist, i.e. the retrieve-and-rescore
      // pipeline's end-to-end recall (rescoring never loses a
      // shortlisted true neighbor)
      val pqShort = pqQids.flatMap { qid =>
        Similarity.annPq(emb, qid, dim = 64, k = 8 * k, m = 8, nCents = 16, iters = 2)
          .collect().map(r => (qid, r.getLong(0)))
      }.toSet
      rows += ((s"annPq shortlist@${8 * k}+exact rescore vs exact-L2, ${pqQids.size} queries", k,
        recall(pqShort, exactL2)))
      // the literature operating point (Jégou et al.: 256 centroids /
      // 8-bit codes per subspace), measured through the persisted-index
      // deployment shape: train+encode once, probe per query. The ADC
      // LUT rides the PqAdcLookup kernel's reference array — this row
      // is also the scale proof that nCents=256 plans stay literal-free.
      if (n >= 512) {
        val idx256 = java.nio.file.Files.createTempDirectory("recall-pq256").toString
        Similarity.savePqIndex(emb, dim = 64, idx256, m = 8, nCents = 256, iters = 2)
        val pqShort256 = pqQids.flatMap { qid =>
          Similarity.annPqPersisted(spark, idx256, vecs(qid), k = 8 * k,
            excludeId = Some(qid))
            .collect().map(r => (qid, r.getLong(0)))
        }.toSet
        rows += ((s"annPq(persisted) m=8 nCents=256 shortlist@${8 * k}+exact rescore, ${pqQids.size} queries", k,
          recall(pqShort256, exactL2)))
      }
    }

    // pair recall bucketed by the exact cosine: banded LSH's collision
    // probability rises steeply with similarity (1−(1−(1−θ/π)^b)^nBands),
    // so "recall at the threshold" mixes the operator's TARGET (near
    // duplicates, cos → 1) with borderline pairs it is designed to let
    // go — report both, separately
    val exactPairsSim: Map[(Long, Long), Double] =
      if (sec("lsh")) Similarity.cosineNearDupsExact(emb, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      else Map.empty
    if (sec("lsh")) {
    // the nBands recall/cost curve (VERDICT r6 #5): the near-dup default
    // should sit at the knee where cos>=0.9 recall crosses 0.95; wall
    // time is the measured cost of each step (coarse — one run each,
    // same JVM — but the RELATIVE cost across nBands is what the curve
    // needs, and candidate volume scales linearly in nBands by design)
    for (nb <- Seq(8, 12, 16)) {
      val t0 = System.nanoTime()
      val lshPairs = Similarity.cosineNearDupsLsh(emb, threshold = 0.5,
        nBands = nb, maxBucketSize = 4096)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      for ((lo, hi, label) <- Seq((0.9, 1.01, "cos>=0.9 (the near-dup target)"),
                                  (0.7, 0.9, "0.7<=cos<0.9"),
                                  (0.5, 0.7, "0.5<=cos<0.7"))) {
        val band = exactPairsSim.collect { case (p, s) if s >= lo && s < hi => p }.toSet
        if (band.nonEmpty)
          rows += ((f"cosineNearDupsLsh t=0.5 nBands=$nb adaptive-b ($sec%.1fs), $label",
            band.size, recall(lshPairs, band)))
      }
      rows += ((f"cosineNearDupsLsh t=0.5 nBands=$nb adaptive-b ($sec%.1fs), ALL pairs",
        exactPairsSim.size, recall(lshPairs, exactPairsSim.keySet)))
    }
    }

    // SemDeDup-style semantic dedup: a true near-dup pair (exact
    // cos >= 0.9) is RESOLVED iff at least one member was dropped.
    // Coverage requires both twins to land in the same k-means cluster
    // — the SemDeDup approximation — so resolution climbs as clusters
    // get finer ONLY while twins stay co-clustered; the measured curve
    // is that tradeoff.
    //
    // The target is the operator's OWN exact definition — a dedicated
    // cosineNearDupsExact run at t=0.9 — NOT the t=0.5 map filtered by
    // its reported cosine: that column is rounded to 6 dp, so pairs at
    // true cos 0.899999x report as 0.9 and land in the denominator as
    // phantom "unresolved" pairs no t=0.9 operator is even allowed to
    // drop (r7's 0.73-0.87 coverage readings included exactly these).
    val target: Set[(Long, Long)] =
      if (sec("semdedup")) Similarity.cosineNearDupsExact(emb, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      else Set.empty
    if (target.nonEmpty) {
      for (nc <- Seq(4, 16, 64)) {
        val t0 = System.nanoTime()
        val kept = Similarity.semanticDedup(emb, threshold = 0.9, dim = 64,
            nClusters = nc)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val resolved = target.count { case (i, j) => !(kept(i) && kept(j)) }
        rows += ((f"semanticDedup t=0.9 nClusters=$nc ($sec%.1fs), pair resolved" +
          (if (nc == 4) " (x_dedup_semantic)" else ""),
          target.size, resolved.toDouble / target.size))
      }
      // the LSH backstop (r7 verdict #4): within-cluster drops UNION
      // banded-LSH candidate drops — cluster-straddling twins now need
      // to also dodge all 16 bands to survive unresolved
      for (nc <- Seq(0, 4)) {
        val t0 = System.nanoTime()
        val kept = Similarity.semanticDedupLshBackstop(emb, threshold = 0.9,
            dim = 64, nClusters = nc)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val resolved = target.count { case (i, j) => !(kept(i) && kept(j)) }
        val label = if (nc == 0)
          s"ADAPTIVE nClusters=${Similarity.adaptiveNClusters(n)}" else s"nClusters=$nc"
        rows += ((f"semanticDedupLshBackstop t=0.9 $label nBands=16 ($sec%.1fs), pair resolved" +
          (if (nc == 4) " (x_dedup_semantic_lsh)" else ""),
          target.size, resolved.toDouble / target.size))
      }
    }

    val secNote = sections.map(s => s" [sections: ${s.mkString(",")}]").getOrElse("")
    println(s"## $sfDir (n=$n embeddings, ${exactPairsSim.size} exact pairs at t=0.5)$secNote")
    println("| operator (catalog entry) | k / |exact| | recall |")
    println("|---|---|---|")
    rows.foreach { case (name, kk, r) => println(f"| $name | $kk | $r%.4f |") }
    spark.stop()
  }
}
