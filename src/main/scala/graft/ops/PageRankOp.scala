package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — iterative link analysis over an edge table
  * (source ranking for crawl frontiers and per-domain quality priors in
  * web-scale training-data curation; the companion iterative-graph
  * operator to Dedup's connected components, which covers the
  * integer-label case).
  *
  * All arithmetic is FIXED-POINT: ranks live in 1e-12 units as BIGINT,
  * divisions are integer `DIV`, and damping is `(x * 85) DIV 100`. That
  * is a deliberate determinism choice, not a shortcut: float PageRank
  * sums millions of contributions whose addition order differs per plan
  * and whose `round()` implementations differ per engine (exact-decimal
  * HALF_UP vs scaled-double rint), so a hash-compared oracle would flake
  * roughly once per ~10^7 roundings. Integer ops are exact and
  * order-free in BOTH engines, and 12 fractional digits is far below any
  * ranking-relevant resolution. Truncation makes total mass decay a few
  * ulps per iteration — documented, deterministic, and identical in the
  * oracle's unrolled replay.
  *
  * Dangling mass (nodes with no out-edges) is redistributed uniformly —
  * the standard correction; dropping it would leak rank at bipartite
  * sinks like the customer→supplier graph the catalog query ranks.
  *
  * Scale shape (100 TB): per iteration, ONE equi-join of the node-sized
  * rank table against the edge table on src (both hash-partitioned on
  * the same key; Catalyst reuses the edge exchange across iterations
  * when AQE materializes it) and ONE map-side-combined aggregation on
  * dst; the dangling term is a single driver-tiny scalar. Nothing per
  * iteration carries more than (node, BIGINT) or (edge, BIGINT) rows. N
  * (node count) is a one-off count() action — a driver scalar by
  * construction, the same justified pattern as the bigram-LM V scalar.
  */
object PageRankOp {

  val Unit12: Long = 1000000000000L // 1.0 in 1e-12 fixed-point units

  /** The materialized graph tables every iteration reads (see
    * [[pageRank]]'s checkpoint rationale) plus the derived scalars. */
  private case class Graph(e: DataFrame, nodes: DataFrame, deg: DataFrame,
                           nN: Long, teleport: Long)

  private def buildGraph(edges: DataFrame, src: String, dst: String): Graph = {
    // Materialize the edge list, node set, and out-degree table ONCE:
    // every iteration reads all three, and without the checkpoint
    // Catalyst re-derives the (possibly expensive) upstream edge plan
    // per reference — measured 8.8s → ~2s at sf0.1 on the purchase
    // graph, whose edge build is itself a large join. Same single-pass
    // idiom as the bigram-LM and dup-span chains; a cluster deployment
    // with preemptible executors would use reliable checkpoints exactly
    // as Dedup.dedupClusters documents.
    // hash-partitioned by _src before the checkpoint: localCheckpoint
    // preserves output partitioning, so the per-iteration contrib join
    // exchanges only the node-sized rank table, never the edges.
    val e = edges.select(col(src).cast("long").as("_src"), col(dst).cast("long").as("_dst"))
      .repartition(col("_src"))
      .localCheckpoint()
    val nodes = e.select(col("_src").as("node"))
      .union(e.select(col("_dst").as("node"))).distinct().localCheckpoint()
    val deg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg")).localCheckpoint()
    val nN: Long = nodes.count() // driver scalar: node count only
    Graph(e, nodes, deg, nN, (Unit12 - Unit12 * 85L / 100L) / nN)
  }

  /** One synchronous PageRank step: rank-weighted contributions along
    * edges, dangling mass redistributed uniformly, damped at 0.85 —
    * all in 1e-12 fixed point. Shared verbatim by the fixed-iteration
    * and iterate-to-convergence faces, so their arithmetic can't drift. */
  private def step(g: Graph, ranks: DataFrame): DataFrame = {
    val rd = ranks.join(g.deg, ranks("node") === g.deg("_src"), "left")
    val contribs = rd.filter(col("_deg").isNotNull)
      .select(col("node").as("_csrc"), expr("rank_u DIV _deg").as("_c"))
      .join(g.e, col("_csrc") === col("_src"))
      .groupBy(col("_dst"))
      .agg(sum(col("_c")).as("_s"))
    val dangling = rd.filter(col("_deg").isNull)
      .agg(coalesce(sum(col("rank_u")), lit(0L)).as("_dm"))
    g.nodes
      .join(contribs, g.nodes("node") === contribs("_dst"), "left")
      .crossJoin(dangling)
      .select(col("node"),
        (lit(g.teleport) +
          expr(s"((coalesce(_s, 0L) + _dm DIV ${g.nN}) * 85) DIV 100").cast("long"))
          .as("rank_u"))
  }

  /** PageRank over `edges` (must be distinct (src, dst) pairs; node ids
    * shared across both columns), `iters` synchronous iterations at
    * damping 0.85. Returns (node, rank_u) with rank_u in 1e-12 units. */
  def pageRank(edges: DataFrame, src: String, dst: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1,10], got $iters")
    val g = buildGraph(edges, src, dst)
    var ranks = g.nodes.select(col("node"), lit(Unit12 / g.nN).as("rank_u"))
    for (_ <- 1 to iters) ranks = step(g, ranks)
    ranks
  }

  /** Personalized PageRank (Page et al.'s biased-teleport variant; the
    * seed-proximity ranking used for "expand from a trusted set" —
    * domain whitelists, curated-source affinity in crawl curation):
    * identical fixed-point iteration to [[pageRank]], except BOTH the
    * teleport mass and the dangling mass flow only to the `seeds` set,
    * uniformly — non-seed nodes earn rank solely through in-links from
    * the seed neighborhood. Initial mass likewise starts on the seeds.
    *
    * `seeds` is a 1-column DataFrame of node ids (ids absent from the
    * graph are counted in nS but hold their teleport share inertly —
    * matching the standard definition where the personalization vector
    * is given, not graph-derived). Scale shape unchanged from
    * [[pageRank]]: the seed set joins once into a node-sized
    * is-seed flag before the checkpoint; per iteration it is the same
    * one rank exchange + one map-side-combined aggregation; |S| is a
    * driver scalar like N. */
  def personalizedPageRank(edges: DataFrame, src: String, dst: String,
                           seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters must be in [1,10], got $iters")
    val g = buildGraph(edges, src, dst)
    val seedCol = seeds.columns.head
    // materialize the (tiny) seed set once: its upstream may be an
    // edge-sized derivation, and it is read twice below (the count
    // scalar + the node-flag join) — without the checkpoint that
    // upstream runs twice (the same re-derivation trap the edge
    // checkpoint in buildGraph closes)
    val s = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .localCheckpoint()
    val nS: Long = s.count() // driver scalar: seed count
    require(nS > 0, "personalizedPageRank: seed set is empty")
    val teleportS: Long = (Unit12 - Unit12 * 85L / 100L) / nS
    // node-sized seed flag, materialized once like the degree table
    val nodes = g.nodes.join(s.withColumn("_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("_seed"), lit(false)).as("_seed"))
      .localCheckpoint()
    var ranks = nodes.select(col("node"),
      when(col("_seed"), lit(Unit12 / nS)).otherwise(lit(0L)).as("rank_u"))
    for (_ <- 1 to iters) {
      val rd = ranks.join(g.deg, ranks("node") === g.deg("_src"), "left")
      val contribs = rd.filter(col("_deg").isNotNull)
        .select(col("node").as("_csrc"), expr("rank_u DIV _deg").as("_c"))
        .join(g.e, col("_csrc") === col("_src"))
        .groupBy(col("_dst"))
        .agg(sum(col("_c")).as("_s"))
      val dangling = rd.filter(col("_deg").isNull)
        .agg(coalesce(sum(col("rank_u")), lit(0L)).as("_dm"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("_dst"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (when(col("_seed"), lit(teleportS)).otherwise(lit(0L)) +
            expr(s"((coalesce(_s, 0L) + (CASE WHEN _seed THEN _dm DIV ${nS}L ELSE 0L END)) * 85) DIV 100")
              .cast("long"))
            .as("rank_u"))
    }
    ranks
  }

  /** PageRank iterated UNTIL the L1 rank delta ‖r_t − r_{t−1}‖₁ drops
    * to `epsUnits` (1e-12 units; the default 10⁶ ≈ 1e-6 total
    * variation) — the "run until stable" face the fixed-iters API
    * can't express. Returns (ranks, iterations run).
    *
    * Two things keep it scale-shaped where the fixed loop could lean
    * on its `iters ≤ 10` guard:
    *  - the rank table is localCheckpointed EVERY round, so plan depth
    *    stays constant at any iteration count (the fixed loop stacks
    *    `iters` joins into one plan — fine at ≤10, not at 100);
    *  - convergence costs NO extra job: the L1 delta accumulates in a
    *    LongAccumulator while the checkpoint materializes the round's
    *    ranks (the same fused-convergence idiom as
    *    Dedup.dedupClusters' changed-label count — task retries can
    *    only overcount, which can only delay convergence by a round,
    *    never falsely declare it).
    *
    * Arithmetic per round is [[step]] — byte-identical to the fixed
    * API, so `pageRankConverged(...)._1` equals `pageRank(...)` run for
    * the same number of iterations, exactly (fixed point has no
    * accumulated-float divergence to blur the comparison; the spec
    * asserts this). Throws if `maxIters` rounds don't reach `epsUnits`
    * — a partially-converged ranking is not detectably different from
    * a converged one downstream, so fail loudly like the CC loop. */
  def pageRankConverged(edges: DataFrame, src: String, dst: String,
                        epsUnits: Long = 1000000L,
                        maxIters: Int = 50): (DataFrame, Int) = {
    require(epsUnits >= 0, s"epsUnits must be >= 0, got $epsUnits")
    require(maxIters >= 1 && maxIters <= 1000,
      s"maxIters must be in [1,1000], got $maxIters")
    val g = buildGraph(edges, src, dst)
    val spark = edges.sparkSession
    var ranks = g.nodes.select(col("node"), lit(Unit12 / g.nN).as("rank_u"))
      .localCheckpoint()
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val tagged = step(g, ranks)
        .join(ranks.withColumnRenamed("rank_u", "_prev"), "node")
      val delta = spark.sparkContext
        .longAccumulator(s"graft.pagerank.delta.round$iters")
      val counted = tagged.mapPartitions { it =>
        it.map { r => // (node, rank_u, _prev)
          delta.add(math.abs(r.getLong(1) - r.getLong(2)))
          r
        }
      }(org.apache.spark.sql.Encoders.row(tagged.schema))
      ranks = counted.toDF().select(col("node"), col("rank_u"))
        .localCheckpoint() // materializes the round AND fills the accumulator
      iters += 1
      converged = delta.value <= epsUnits
    }
    if (!converged) throw new IllegalStateException(
      s"pageRankConverged: L1 delta still above $epsUnits after $maxIters rounds; " +
        "raise maxIters or epsUnits")
    (ranks, iters)
  }
}
