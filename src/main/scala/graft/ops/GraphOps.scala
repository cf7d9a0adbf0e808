package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph structure metrics on an edge list. Companion to the
  * iterative operators (PageRankOp, Dedup.dedupClusters' connected
  * components): these are the one-shot join-shaped statistics.
  */
object GraphOps {

  /** Triangle count + global clustering coefficient, by degree-ordered
    * edge iteration (the "compact-forward" orientation, Latapy 2008;
    * the same rank trick MapReduce triangle counters use, e.g. Suri &
    * Vassilvitskii WWW'11): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher one, then count each
    * edge u→v's triangles as |adj⁺(u) ∩ adj⁺(v)| over the FORWARD
    * adjacencies. Every triangle {u<v<w} is counted exactly once (at
    * its u→v edge), and all per-node work is bounded by the
    * orientation's out-degree — O(√m) on any graph — versus the
    * raw-degree fan-out of the naive a<b<c join that explodes on hub
    * nodes (a celebrity node with degree 10⁶ contributes 10¹² naive
    * wedges but only its forward-neighbor pairs here).
    *
    * Input: an edge list with possible duplicates/self-loops/reversed
    * copies — canonicalized to a distinct undirected (a < b) set first.
    *
    * Output: ONE row — `n_nodes`, `n_edges`, `n_wedges` (open+closed
    * paths of length 2, Σ deg·(deg−1)/2, exact integer), `n_triangles`,
    * and `gcc` = 3·triangles / wedges (the transitivity ratio, one
    * exactly-rounded IEEE division, 6 dp).
    *
    * Scale shape: the canonical edge set is checkpointed for its three
    * consumers (degree table, orientation, edge count), the oriented
    * set for its two (adjacency build, closure probe); every exchange
    * carries 8-byte node ids or one packed sorted adjacency array per
    * node; the closure's intersections run in the codegen'd
    * [[org.apache.spark.sql.graftext.SortedIntersectCount]] merge-scan
    * kernel. The only super-linear term is the wedge-bounded intersect
    * work itself, capped by the orientation. */
  /** Canonical undirected edge set: distinct (a < b), self-loops
    * dropped, checkpointed once for its downstream consumers. When the
    * caller PROMISES the input is already canonical (distinct, src <
    * dst, loop-free — e.g. it was just built by a `x.k < y.k`
    * self-join + distinct), the canonicalization's own full exchange
    * of the edge table is skipped: only the checkpoint materialization
    * remains. The promise is a caller contract — a violating input
    * would double-count edges downstream. */
  private def canonical(edges: DataFrame, srcCol: String, dstCol: String,
                        assumeCanonical: Boolean = false): DataFrame =
    if (assumeCanonical)
      edges.select(col(srcCol).as("a"), col(dstCol).as("b")).localCheckpoint()
    else edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()

  def triangleStats(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst",
                    assumeCanonical: Boolean = false): DataFrame = {
    val ed = canonical(edges, srcCol, dstCol, assumeCanonical)
    val deg = ed.select(col("a").as("node"))
      .unionAll(ed.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id) rank: src' = lower endpoint. deg is
    // node-count-sized; the hints keep both orientation joins hash
    // joins — the edge stream never pays a sort it doesn't need
    val oriented = ed
      .join(deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("d")))
          .otherwise(struct(col("b").as("s"), col("a").as("d")))
          .as("o"))
      .select(col("o.s").as("src"), col("o.d").as("dst"))
      .localCheckpoint()
    // edge-iterator closure: a triangle {u,v,w} with rank u < v < w is
    // counted exactly once, at its oriented edge u→v, as a common
    // FORWARD neighbor of u and v. Forward adjacencies ride as one
    // packed sorted array per node — the per-wedge cost is an array
    // entry inside a Tungsten row plus one step of the codegen'd
    // merge-scan intersect kernel, never a shuffled 16-byte wedge row
    // with its per-row exchange overhead (the explicit wedge-stream +
    // closure-join plan was measured materially slower at sf1; see
    // BENCH_SCALE.md for the committed numbers). Both adjacency joins
    // are hash joins by hint — nothing here needs an order
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint()
    val triPerEdge = oriented
      .join(adj.hint("shuffle_hash"), "src")
      .withColumnRenamed("nbrs", "nu")
      .join(adj.hint("shuffle_hash").withColumnRenamed("src", "dst"), "dst")
      .select(org.apache.spark.sql.graftext.VectorExpressions
        .sortedIntersectCount(col("nu"), col("nbrs")).as("nt"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(deg * (deg - 1)) div 2")).cast("bigint").as("n_wedges"))
    val edgeStats = ed.agg(count(lit(1)).as("n_edges"))
    val triStats = triPerEdge.agg(
      coalesce(sum(col("nt")), lit(0L)).cast("bigint").as("n_triangles"))
    nodeStats.crossJoin(edgeStats).crossJoin(triStats)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round((lit(3.0) * col("n_triangles")) / col("n_wedges"), 6))
          .as("gcc"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007's LPA, made
    * deterministic): every node starts labeled with its own id; each
    * round it adopts the label most frequent among its neighbors,
    * ties broken by SMALLEST label; all nodes update simultaneously
    * from the previous round's labels (the asynchronous/random-order
    * variants converge faster but are non-reproducible — a
    * deterministic engine can't ship them). Runs a FIXED `iters`
    * rounds; the per-round label table is localCheckpointed so plan
    * depth and lineage stay O(1) per round (the same bounded-lineage
    * discipline as PageRankOp / the CC loop).
    *
    * Per round: one join of the symmetrized edge list against the
    * label table (8-byte ids only), a (node, label) count, and a
    * max-struct argmax — max(struct(cnt, −label)) picks highest count
    * then lowest label without a per-node sort window.
    *
    * Output: (node, label) for every node of the canonicalized graph.
    */
  def labelPropagation(edges: DataFrame, srcCol: String = "src",
                       dstCol: String = "dst", iters: Int = 3,
                       assumeCanonical: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20, s"labelPropagation: iters must be in [1, 20], got $iters")
    val ed = canonical(edges, srcCol, dstCol, assumeCanonical)
    val sym0 = ed.select(col("a").as("u"), col("b").as("v"))
      .unionAll(ed.select(col("b").as("u"), col("a").as("v")))
    // A/B face (spark.graft.lpa.prepartition=true): materialize the
    // symmetrized list ALREADY HASH-PARTITIONED on the join key — the
    // checkpoint's LogicalRDD keeps outputPartitioning, so every
    // round's shuffle-hash join skips re-exchanging the edge side
    // (iters−1 edge-sized exchanges saved for one up-front write).
    // The per-round (v, label) message rollup exchange remains either
    // way; same results by construction, measured via BENCH_SCALE §LPA.
    val sym =
      if (edges.sparkSession.conf.getOption("spark.graft.lpa.prepartition")
            .exists(_.toBoolean))
        sym0.repartition(col("u")).localCheckpoint()
      else sym0
    var labels = ed.select(col("a").as("node"))
      .unionAll(ed.select(col("b").as("node")))
      .distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      labels = sym
        .join(labels.select(col("node").as("u"), col("label")).hint("shuffle_hash"), "u")
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("v").as("node"), (-col("m.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Multi-source BFS hop distance, fixed `rounds`: every seed starts
    * at hop 0; round r labels every still-unlabeled neighbor of the
    * round-(r−1) frontier with hop r. The result is the exact
    * min-hop-distance table truncated at `rounds` — nodes farther than
    * `rounds` hops (or disconnected) are absent. Seeds that never
    * appear in the edge list still surface at hop 0 (an isolated seed
    * has distance 0 to itself). A FIXED round count keeps the result
    * reproducible and the plan statically bounded, the same contract as
    * [[labelPropagation]]/[[kcorePeel]]; for iterate-to-empty-frontier
    * semantics see the accumulator-fused convergence pattern in
    * [[graft.dedup.Dedup.dedupClusters]].
    *
    * Per round: ONE edge⋈frontier join (8-byte ids only — the
    * symmetrized edge list is checkpointed once, partitioned on the
    * probe side `u`), a distinct on the discovered nodes, and a
    * LEFT ANTI against the visited set. The frontier only ever
    * shrinks relative to the reachable set, and the anti join keeps
    * revisits out of the next round's probe — on a 100 TB graph each
    * round's exchanges are bounded by the frontier's node count, never
    * re-expanding the full edge set. Visited/frontier tables are
    * localCheckpointed per round (bounded lineage).
    *
    * Output: (node, hop), one row per reached node. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, srcCol: String = "src",
              dstCol: String = "dst", seedCol: String = "node",
              rounds: Int = 3, assumeCanonical: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"bfsHops: rounds must be in [1, 20], got $rounds")
    val ed = canonical(edges, srcCol, dstCol, assumeCanonical)
    val sym = ed.select(col("a").as("u"), col("b").as("v"))
      .unionAll(ed.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    // only each round's FRONTIER is materialized; the visited set is
    // the union of the already-checkpointed round tables (O(rounds)
    // plan width, zero recompute) — re-materializing the whole
    // distance table every round would write the cumulative reachable
    // set `rounds` times over
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0)).localCheckpoint()
    var frontier = dist.select(col("node"))
    for (r <- 1 to rounds) {
      val next = sym
        .join(frontier.select(col("node").as("u")).hint("shuffle_hash"), "u")
        .select(col("v").as("node")).distinct()
        .join(dist.select(col("node")).hint("shuffle_hash"), Seq("node"), "left_anti")
        .withColumn("hop", lit(r))
        .localCheckpoint()
      dist = dist.unionAll(next)
      frontier = next.select(col("node"))
    }
    dist
  }

  /** Fixed-round k-core peeling: each round recomputes degrees over
    * the surviving edge set and drops every node below `k`, edges
    * restricted to surviving endpoints by two left-semi joins. True
    * k-core iterates to a fixpoint; a FIXED round count keeps the
    * result reproducible and the plan statically bounded — callers
    * read the trajectory to see whether it stabilized (equal rows) or
    * was still cascading. Per-round edge sets are localCheckpointed
    * (bounded lineage, one materialization each); every exchange
    * carries 8-byte node ids.
    *
    * Output: one row per round — `round`, `n_nodes` (nodes still
    * carrying an edge), `n_edges`. */
  def kcorePeel(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                k: Int = 2, rounds: Int = 3,
                assumeCanonical: Boolean = false): DataFrame = {
    require(k >= 1, s"kcorePeel: k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 10, s"kcorePeel: rounds must be in [1, 10], got $rounds")
    def degOf(d: DataFrame): DataFrame = d.select(col("a").as("node"))
      .unionAll(d.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var e = canonical(edges, srcCol, dstCol, assumeCanonical)
    // ONE degree aggregation per round: the checkpointed node-sized
    // table feeds both this round's stats (n_nodes = its row count,
    // n_edges = Σdeg/2 — no second pass over the edge ends) and the
    // next round's peel filter
    var deg = degOf(e).localCheckpoint()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (r <- 1 to rounds) {
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      e = e
        .join(keep.select(col("node").as("a")).hint("shuffle_hash"), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")).hint("shuffle_hash"), Seq("b"), "left_semi")
        .localCheckpoint()
      deg = degOf(e).localCheckpoint()
      val st = deg.agg(count(lit(1)).as("n"),
        coalesce(sum(col("deg")), lit(0L)).cast("bigint").as("s")).collect()(0)
      buf += ((r, st.getLong(0), st.getLong(1) / 2))
    }
    val spark = edges.sparkSession
    import spark.implicits._
    buf.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** k-truss peeling trajectory — the EDGE-strength sibling of
    * [[kcorePeel]] (Cohen 2008): each round computes every edge's
    * triangle support and deletes edges supported by fewer than k−2
    * triangles; what survives all rounds is tending to the k-truss,
    * the standard cohesive-subgraph definition one notch stronger than
    * the k-core (every surviving relationship is REINFORCED by ≥ k−2
    * common neighbors, not merely incident to a busy node).
    *
    * Triangles are enumerated ONCE, on the initial graph, with
    * [[triangleStats]]'s degree-oriented edge iterator (packed sorted
    * forward adjacencies; each triangle {u,v,w} materializes once, at
    * its lowest-rank oriented edge) — edge deletion can never CREATE a
    * triangle, so every later round's triangle set is exactly the
    * alive subset (all three edges surviving), maintained by three
    * composite-key semi-joins per round instead of a re-enumeration
    * (the re-enumerating variant measured 84 s at sf1; this shape pays
    * the enumeration once). Edge/support/triangle tables are
    * localCheckpointed per round (the kcore bounded-lineage
    * discipline); n_triangles falls out of the support sum (Σsup = 3Δ)
    * with no extra pass.
    *
    * Output: one row per round — (round, n_edges entering the round,
    * n_triangles on that edge set, n_removed by the round's peel). */
  def ktrussPeel(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                 k: Int = 6, rounds: Int = 3,
                 assumeCanonical: Boolean = false): DataFrame = {
    require(k >= 3, s"ktrussPeel: k must be >= 3, got $k")
    require(rounds >= 1 && rounds <= 10, s"ktrussPeel: rounds must be in [1, 10], got $rounds")
    var e = canonical(edges, srcCol, dstCol, assumeCanonical)
    // Triangle triples of the initial graph: the triangleStats
    // degree-oriented enumeration, each triangle materialized once as
    // its ID-sorted (ta < tb < tc) triple; the ID-sort is codegen'd
    // least/greatest arithmetic (an array_sort per triangle allocates).
    def supportTriples(g: DataFrame): DataFrame = {
      val deg = g.select(col("a").as("node"))
        .unionAll(g.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val oriented = g
        .join(deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"), "b")
        .select(
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("s"), col("b").as("d")))
            .otherwise(struct(col("b").as("s"), col("a").as("d")))
            .as("o"))
        .select(col("o.s").as("src"), col("o.d").as("dst"))
        .localCheckpoint()
      val adj = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        .localCheckpoint()
      oriented
        .join(adj.hint("shuffle_hash"), "src")
        .withColumnRenamed("nbrs", "nu")
        .join(adj.hint("shuffle_hash").withColumnRenamed("src", "dst"), "dst")
        .select(col("src").as("u"), col("dst").as("v"),
          explode(array_intersect(col("nu"), col("nbrs"))).as("w"))
        .select(least(col("u"), col("v"), col("w")).as("ta"),
          (col("u") + col("v") + col("w") - least(col("u"), col("v"), col("w"))
            - greatest(col("u"), col("v"), col("w"))).as("tb"),
          greatest(col("u"), col("v"), col("w")).as("tc"))
        .localCheckpoint()
    }
    // Triangles are enumerated ONCE, on the initial graph (support needs
    // the full enumeration anyway); later rounds maintain the ALIVE
    // subset — all three edges surviving — with three composite-key
    // semi-joins over the Δ-sized triple table. Measured at sf1 against
    // the alternative (re-enumerating the survivor graph per round):
    // 27.1 s vs 53.2 s — the co-occurrence graph keeps ~40% of its
    // edges through the peel, so a re-enumeration repays most of the
    // round-1 cost every round while the semi-joins only shuffle
    // shrinking id triples. Deletion can't create triangles, so both
    // shapes are exact.
    var alive = supportTriples(e)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val ne = e.count()
      val sup = alive
        .select(explode(array(
          struct(col("ta").as("ea"), col("tb").as("eb")),
          struct(col("ta").as("ea"), col("tc").as("eb")),
          struct(col("tb").as("ea"), col("tc").as("eb")))).as("p"))
        .select(col("p.ea").as("a"), col("p.eb").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup"))
        .localCheckpoint()
      val nTri = sup.agg(coalesce(sum(col("sup")), lit(0L)).cast("bigint").as("s"))
        .collect()(0).getLong(0) / 3
      e = e.join(sup, Seq("a", "b"), "left")
        .filter(coalesce(col("sup"), lit(0L)) >= (k - 2).toLong)
        .select(col("a"), col("b"))
        .localCheckpoint()
      val nKept = e.count()
      buf += ((r, ne, nTri, ne - nKept))
      if (r < rounds) alive = alive
        .join(e.select(col("a").as("ta"), col("b").as("tb")).hint("shuffle_hash"),
          Seq("ta", "tb"), "left_semi")
        .join(e.select(col("a").as("ta"), col("b").as("tc")).hint("shuffle_hash"),
          Seq("ta", "tc"), "left_semi")
        .join(e.select(col("a").as("tb"), col("b").as("tc")).hint("shuffle_hash"),
          Seq("tb", "tc"), "left_semi")
        .localCheckpoint()
    }
    val spark = edges.sparkSession
    import spark.implicits._
    buf.toSeq.toDF("round", "n_edges", "n_triangles", "n_removed")
      .select(col("round").cast("int").as("round"), col("n_edges"),
        col("n_triangles"), col("n_removed"))
  }

  /** Iterate-to-fixpoint k-core: [[kcorePeel]]'s loop run until a round
    * peels nothing (consecutive (n_nodes, n_edges) equal — the true
    * k-core), up to `maxRounds`. No extra convergence job: the peel
    * loop already collects a 1-row stats table per round for the
    * trajectory, so the fixpoint test is a driver-side equality on
    * numbers it was computing anyway (cheaper than the accumulator
    * fusion [[PageRankOp.pageRankConverged]] needs, because there the
    * per-round materialization had no collect to piggyback on).
    *
    * Per-round plan is identical to kcorePeel (one degree aggregation
    * feeding both stats and next round's filter; localCheckpointed
    * edge/degree tables bound lineage at any round count). Throws if
    * `maxRounds` rounds don't stabilize — a partially-peeled core is
    * not detectably different downstream, so fail loudly (the
    * pageRankConverged / CC-loop contract).
    *
    * Output: (trajectory DataFrame — same schema as kcorePeel, ending
    * at the first stable round — , rounds actually run). */
  def kcoreFixpoint(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                    k: Int = 2, maxRounds: Int = 50,
                    assumeCanonical: Boolean = false): (DataFrame, Int) = {
    require(k >= 1, s"kcoreFixpoint: k must be >= 1, got $k")
    require(maxRounds >= 1 && maxRounds <= 1000,
      s"kcoreFixpoint: maxRounds must be in [1, 1000], got $maxRounds")
    def degOf(d: DataFrame): DataFrame = d.select(col("a").as("node"))
      .unionAll(d.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var e = canonical(edges, srcCol, dstCol, assumeCanonical)
    var deg = degOf(e).localCheckpoint()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var prev: Option[(Long, Long)] = None
    var r = 0
    var stable = false
    while (!stable && r < maxRounds) {
      r += 1
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      e = e
        .join(keep.select(col("node").as("a")).hint("shuffle_hash"), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")).hint("shuffle_hash"), Seq("b"), "left_semi")
        .localCheckpoint()
      deg = degOf(e).localCheckpoint()
      val st = deg.agg(count(lit(1)).as("n"),
        coalesce(sum(col("deg")), lit(0L)).cast("bigint").as("s")).collect()(0)
      val cur = (st.getLong(0), st.getLong(1) / 2)
      buf += ((r, cur._1, cur._2))
      stable = prev.contains(cur)
      prev = Some(cur)
    }
    if (!stable) throw new IllegalStateException(
      s"kcoreFixpoint: still peeling after $maxRounds rounds; raise maxRounds")
    val spark = edges.sparkSession
    import spark.implicits._
    (buf.toSeq.toDF("round", "n_nodes", "n_edges"), r)
  }

  /** One-row structural summary: node/edge counts, degree min/max/mean,
    * and the degree assortativity coefficient — Newman 2002's r, the
    * Pearson correlation of (deg u, deg v) over all DIRECTED edge
    * occurrences. With identical marginals (every undirected edge
    * contributes both orientations) the sqrt-free form is exact:
    *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²),   M = 2·edges,
    * where Σx = Σ deg², Σx² = Σ deg³ come from the degree table alone
    * and only Σxy needs the per-edge deg·deg join. The three final
    * products can pass 2⁶³ on large graphs, so they are computed in
    * DECIMAL(38,0) (exact; the oracle uses HUGEINT — same integers),
    * and r is ONE exactly-rounded IEEE division at the end. A regular
    * graph has zero degree variance — r is defined as 0.0 there. */
  def graphStats(edges: DataFrame, srcCol: String = "src",
                 dstCol: String = "dst",
                 assumeCanonical: Boolean = false): DataFrame = {
    val ed = canonical(edges, srcCol, dstCol, assumeCanonical)
    val deg = ed.select(col("a").as("node"))
      .unionAll(ed.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val degAgg = deg.agg(
      count(lit(1)).as("n_nodes"),
      min(col("deg")).as("min_deg"),
      max(col("deg")).as("max_deg"),
      sum(col("deg")).cast("bigint").as("sum_deg"),
      sum(col("deg").cast("decimal(19,0)") * col("deg").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("sx"),
      sum(col("deg").cast("decimal(19,0)") * col("deg").cast("decimal(19,0)")
        * col("deg").cast("decimal(19,0)")).cast("decimal(38,0)").as("sxx"))
    val prodAgg = ed
      .join(deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"), "b")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("da").cast("decimal(19,0)") * col("db").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sab"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    degAgg.crossJoin(prodAgg)
      .select(col("n_nodes"), col("n_edges"), col("min_deg"), col("max_deg"),
        round(col("sum_deg").cast("double") / col("n_nodes"), 6).as("avg_deg"),
        (d(lit(2) * col("n_edges")) * d(lit(2) * col("sab")) - d(col("sx")) * d(col("sx"))).as("num"),
        (d(lit(2) * col("n_edges")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))).as("den"))
      .select(col("n_nodes"), col("n_edges"), col("min_deg"), col("max_deg"), col("avg_deg"),
        when(col("den") === 0, lit(0.0))
          .otherwise(round(col("num").cast("double") / col("den").cast("double"), 6))
          .as("assortativity"))
  }
}
