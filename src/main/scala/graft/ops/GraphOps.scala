package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph structure metrics on an edge list. Companion to the
  * iterative operators (PageRankOp, Dedup.dedupClusters' connected
  * components): these are the one-shot join-shaped statistics plus the
  * peeling trajectories.
  *
  * All operators run off a shared [[GraphFace]] — the lazily-built,
  * localCheckpointed derived tables of ONE graph (canonical edge set,
  * degree table, symmetrized list, degree-ordered orientation, packed
  * forward adjacency, triangle triples). A workload that asks several
  * structural questions of the same graph (triangles + truss + stats +
  * core, the x_* catalog shape) builds each face exactly once instead
  * of once per question — at sf1 the canonical co-occurrence build
  * alone is seconds per rebuild, and the orientation + adjacency pair
  * was previously built twice (triangleStats and ktrussPeel had twin
  * private copies). The DataFrame-first entry points remain and build
  * a throwaway face.
  */
object GraphOps {

  /** Checkpoint keeping the dataset's physical partitioning readable
    * by downstream planners: materialized AQE-off because an adaptive
    * plan's checkpoint records UnknownPartitioning — which silently
    * re-introduces every exchange the face/round layout was built to
    * avoid (GraftPins.withAqeOff scaladoc; probed r13). Used for ALL
    * face and per-round checkpoints in this file. */
  private implicit class CkOps(private val df: DataFrame) {
    def ckKeepPartitioning: DataFrame =
      org.apache.spark.sql.graftext.GraftPins.withAqeOff(df.sparkSession)(
        df.localCheckpoint())
  }

  /** The shared faces of one undirected graph, each materialized at
    * most once (lazy + localCheckpoint — the invIndexFor persistence
    * idea, in-session). Build via [[GraphOps.face]].
    *
    * Scale notes per face: `canonical`/`oriented` are edge-sized
    * 16-byte rows; `deg` is node-sized; `sym` is 2×edges and
    * HASH-PARTITIONED ON `u` so every per-round frontier/label/peel
    * join downstream skips the edge-side exchange (the checkpoint's
    * LogicalRDD keeps outputPartitioning); `adj` packs each node's
    * sorted forward neighbors as one array (Σ = edges entries);
    * `triples` is one row per triangle. A consumer pays only for the
    * faces it touches.
    */
  final class GraphFace private[GraphOps] (
      edges: DataFrame, srcCol: String, dstCol: String, assumeCanonical: Boolean,
      pinned: Boolean) {

    private[GraphOps] def spark = edges.sparkSession

    /** Session confs are SNAPSHOT at face construction, not read at
      * first materialization: a face's lazy tables are built once and
      * cached, so a conf toggled after the face exists could never
      * affect it anyway — capturing eagerly makes that explicit
      * (an in-session A/B of these knobs must build a new face). */
    private[GraphOps] val heavySplitDegree: Int =
      spark.conf.getOption("spark.graft.graph.heavySplitDegree").map(_.toInt).getOrElse(0)
    private val validateCanonical: Boolean =
      spark.conf.getOption("spark.graft.graph.validateCanonical").exists(_.toBoolean)

    /** Every checkpointed face, for [[release]]. */
    private val materialized =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

    /** Drop every face this instance materialized: deregister its
      * GraftPins entries (pinned faces) and unpersist the checkpoint
      * blocks. Call when a cached face is discarded — replaced by a
      * rebuild after the dataset files changed, or its session ended —
      * so stale localCheckpoint blocks don't outlive their usefulness
      * (nothing else may free a pinned face by contract). The face
      * must not be used afterwards: a localCheckpoint's lineage is
      * truncated, so the data is gone, not recomputable. */
    def release(): Unit = materialized.forEach { c =>
      // unpin deregisters (no-op for throwaway faces) and unpersists
      // the backing RDD — Dataset.unpersist only consults the
      // CacheManager, which never saw a localCheckpoint's blocks
      org.apache.spark.sql.graftext.GraftPins.unpin(c)
    }

    /** Checkpoint a face; a PINNED face (one cached across queries)
      * additionally registers its blocks with
      * [[org.apache.spark.sql.graftext.GraftPins]] so between-query
      * pinned-block sweeps (graft.Bench) don't destroy it — a
      * localCheckpoint's lineage is truncated, so an unpersist there
      * is data loss, not cache eviction. Throwaway faces stay
      * unpinned and sweepable.
      *
      * `keepLayout` picks the materialization mode PER FACE (the r14
      * ktruss adjudication): AQE-off (partitioning-preserving — under
      * AQE the checkpoint's LogicalRDD records UnknownPartitioning,
      * silently discarding the layout the face just paid to establish;
      * GraftPins.withAqeOff scaladoc, probed r13) ONLY for the faces
      * whose layout downstream consumers actually cluster on — `deg`
      * (node), `sym` (u), `adj` (src). `canonical` is HashPartitioning
      * (a, b), which no consumer's single-key join can ride; `oriented`
      * and `triples` are struct-projections with no alias-trackable
      * layout — for those three AQE-off materialization costs the
      * small-table partition coalescing and buys nothing (measured: the
      * sf0.1 ktruss 2x-vs-floor flag). */
    private def ck(df: DataFrame, keepLayout: Boolean): DataFrame = {
      val c = if (keepLayout) df.ckKeepPartitioning else df.localCheckpoint()
      if (pinned) org.apache.spark.sql.graftext.GraftPins.pin(c)
      materialized.add(c)
      c
    }

    /** Canonical undirected edge set: distinct (a < b), self-loops
      * dropped, checkpointed once for all downstream consumers. When
      * the caller PROMISES the input is already canonical (distinct,
      * src < dst, loop-free — e.g. it was just built by a `x.k < y.k`
      * self-join + distinct), the canonicalization's own full exchange
      * of the edge table is skipped: only the checkpoint
      * materialization remains. The promise is a caller contract — a
      * violating input would SILENTLY double-count edges downstream
      * (the default posture; all in-repo callers feed a
      * `x < y` self-join + distinct). Debug builds can make the trap
      * loud: `spark.graft.graph.validateCanonical=true` (snapshot at
      * face construction, like the skew knob) adds one cheap
      * aggregate over the promised edge set — count vs distinct
      * count, plus a src < dst violation count — and throws on any
      * breach before the face is checkpointed. */
    lazy val canonical: DataFrame =
      if (assumeCanonical) {
        val c = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
        if (validateCanonical) {
          // NULL endpoints are counted on their own: count_distinct
          // skips NULL-bearing rows, so without the explicit term a
          // NULL edge would surface as a misleading n != nd
          // "duplicate edges" report instead of naming the NULLs
          val st = c.agg(
            count(lit(1)).as("n"),
            count_distinct(col("a"), col("b")).as("nd"),
            sum(when(col("a") >= col("b"), 1L).otherwise(0L)).as("bad"),
            sum(when(col("a").isNull || col("b").isNull, 1L).otherwise(0L)).as("nulls"))
            .collect()(0)
          val (n, nd, bad, nulls) = (st.getLong(0), st.getLong(1),
            if (st.isNullAt(2)) 0L else st.getLong(2),
            if (st.isNullAt(3)) 0L else st.getLong(3))
          if (nulls > 0) throw new IllegalArgumentException(
            s"GraphFace(assumeCanonical = true): input violates the canonical-edge " +
              s"promise ($nulls rows with a NULL endpoint) — canonicalize the input " +
              "or drop the promise")
          if (n != nd || bad > 0) throw new IllegalArgumentException(
            s"GraphFace(assumeCanonical = true): input violates the canonical-edge " +
              s"promise ($n rows, $nd distinct, $bad with src >= dst) — results would " +
              "double-count edges; canonicalize the input or drop the promise")
        }
        ck(c, keepLayout = false)
      }
      else ck(edges
        .select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct(), keepLayout = false)

    /** Degree table (node, deg), hash-partitioned on node by its own
      * rollup, checkpointed — feeds the orientation joins, graphStats
      * moments, and the k-core peel's initial state. */
    lazy val deg: DataFrame = ck(canonical.select(col("a").as("node"))
      .unionAll(canonical.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")), keepLayout = true)

    /** Symmetrized edge list (u, v), both directions, repartitioned on
      * the probe key `u` and checkpointed: every iterative consumer
      * (BFS frontier joins, LPA label joins, the incremental k-core's
      * loss join) probes it per round WITHOUT re-exchanging the edge
      * side. Standalone, the up-front exchange+write roughly cancels
      * the per-round savings at local[32] (the r10 LPA A/B:
      * base 13.26 s vs prepartition 14.15 s at sf1); SHARED across the
      * iterative operators of one graph the build is paid once and
      * every round of every consumer rides it, which flips the trade. */
    lazy val sym: DataFrame = ck(canonical.select(col("a").as("u"), col("b").as("v"))
      .unionAll(canonical.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u")), keepLayout = true)

    /** Degree-(deg, id)-ordered forward edges (src, dst): every
      * undirected edge oriented from its lower-(deg, id) endpoint —
      * the "compact-forward" orientation (Latapy 2008; the Suri &
      * Vassilvitskii WWW'11 MapReduce rank trick). All per-node
      * closure work downstream is bounded by the orientation's
      * out-degree — O(√m) on any graph. The deg lookups are hash
      * joins by hint: the edge stream never pays a sort. */
    lazy val oriented: DataFrame = ck(canonical
      .join(deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("d")))
          .otherwise(struct(col("b").as("s"), col("a").as("d")))
          .as("o"))
      .select(col("o.s").as("src"), col("o.d").as("dst")), keepLayout = false)

    /** Packed sorted forward adjacency: one (src, nbrs) row per node
      * with out-edges, nbrs sorted for the merge-scan intersect
      * kernel. Σ array entries = edge count. */
    lazy val adj: DataFrame = ck(oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs")), keepLayout = true)

    /** Triangle triples (ta < tb < tc), one row per triangle of the
      * graph, from the oriented closure (each triangle {u,v,w}
      * materializes exactly once, at its lowest-rank oriented edge).
      * The middle id is nested least/greatest (median-of-3), not the
      * u+v+w−min−max identity — the transient three-way sum could
      * overflow Long for ids above ~Long.MaxValue/3 and silently
      * corrupt triple keys. */
    lazy val triples: DataFrame = ck(closure(this)
      .select(col("src").as("u"), col("dst").as("v"),
        explode(array_intersect(col("nu"), col("nbrs"))).as("w"))
      .select(least(col("u"), col("v"), col("w")).as("ta"),
        greatest(least(col("u"), col("v")),
          least(greatest(col("u"), col("v")), col("w"))).as("tb"),
        greatest(col("u"), col("v"), col("w")).as("tc")), keepLayout = false)
  }

  /** Build the shared face of one graph. `assumeCanonical = true`
    * promises the input is already a distinct, loop-free src < dst
    * edge set (skips the canonicalization exchange). */
  def face(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
           assumeCanonical: Boolean = false, pinned: Boolean = false): GraphFace =
    new GraphFace(edges, srcCol, dstCol, assumeCanonical, pinned)

  /** The triangle closure join: oriented edges with BOTH endpoints'
    * forward adjacencies attached — (src, dst, nu, nbrs), hash joins
    * by hint (nothing here needs an order). Consumed by
    * [[triangleStats]] (merge-scan intersect COUNT per edge) and
    * [[GraphFace.triples]] (intersect EXPLODE into triangle rows).
    *
    * Skew face (`spark.graft.graph.heavySplitDegree` = T > 0): the
    * source-side adjacency is served in ≤ T-wide sorted chunks
    * (slice + explode, chunks partition the array, so per-edge counts
    * and exploded triangles are unchanged) — the standard
    * high-degree-vertex split: a hub's edges carry bounded-width
    * array payloads through the dst-side exchange instead of one
    * giant row each. On near-regular graphs (the TPC-H co-occurrence
    * graph: deg 38–222 at sf1) total bytes are unchanged and the
    * chunking is a measured no-op, so the default is OFF; it exists
    * for power-law graphs where a single packed hub row would
    * dominate a partition (BENCH_SCALE §TRI-SPLIT has the A/B). The
    * knob is SNAPSHOT at face construction ([[GraphFace]] scaladoc) —
    * the closure feeds the cached `triples` face, so a post-build
    * toggle could never apply to it; build a new face to A/B. */
  private def closure(f: GraphFace): DataFrame = {
    val t = f.heavySplitDegree
    val srcAdj =
      if (t <= 0) f.adj
      else f.adj.select(col("src"),
        explode(expr(
          s"transform(sequence(0, greatest(cast(ceil(size(nbrs) / $t.0) as int), 1) - 1), " +
            s"i -> slice(nbrs, i * $t + 1, $t))")).as("nbrs"))
    f.oriented
      .join(srcAdj.hint("shuffle_hash"), "src")
      .withColumnRenamed("nbrs", "nu")
      .join(f.adj.hint("shuffle_hash").withColumnRenamed("src", "dst"), "dst")
  }

  /** Triangle count + global clustering coefficient, by degree-ordered
    * edge iteration: count each oriented edge u→v's triangles as
    * |adj⁺(u) ∩ adj⁺(v)| over the FORWARD adjacencies. Every triangle
    * {u<v<w} is counted exactly once (at its u→v edge), and all
    * per-node work is bounded by the orientation's out-degree —
    * O(√m) — versus the raw-degree fan-out of the naive a<b<c join
    * that explodes on hub nodes.
    *
    * Output: ONE row — `n_nodes`, `n_edges`, `n_wedges` (open+closed
    * paths of length 2, Σ deg·(deg−1)/2, exact integer), `n_triangles`,
    * and `gcc` = 3·triangles / wedges (the transitivity ratio, one
    * exactly-rounded IEEE division, 6 dp).
    *
    * Scale shape: every face is checkpointed once and shared
    * ([[GraphFace]]); every exchange carries 8-byte node ids or one
    * packed sorted adjacency array per node; the closure's
    * intersections run in the codegen'd
    * [[org.apache.spark.sql.graftext.SortedIntersectCount]] merge-scan
    * kernel (the explicit wedge-stream + closure-join plan measured
    * 6.5× slower at sf1 — BENCH_SCALE §TRI). The only super-linear
    * term is the wedge-bounded intersect work itself, capped by the
    * orientation. */
  def triangleStats(f: GraphFace): DataFrame = {
    val triPerEdge = closure(f)
      .select(org.apache.spark.sql.graftext.VectorExpressions
        .sortedIntersectCount(col("nu"), col("nbrs")).as("nt"))
    val nodeStats = f.deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(deg * (deg - 1)) div 2")).cast("bigint").as("n_wedges"))
    val edgeStats = f.canonical.agg(count(lit(1)).as("n_edges"))
    val triStats = triPerEdge.agg(
      coalesce(sum(col("nt")), lit(0L)).cast("bigint").as("n_triangles"))
    nodeStats.crossJoin(edgeStats).crossJoin(triStats)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise(round((lit(3.0) * col("n_triangles")) / col("n_wedges"), 6))
          .as("gcc"))
  }

  def triangleStats(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst",
                    assumeCanonical: Boolean = false): DataFrame =
    triangleStats(face(edges, srcCol, dstCol, assumeCanonical))

  /** Synchronous label propagation (Raghavan et al. 2007's LPA, made
    * deterministic): every node starts labeled with its own id; each
    * round it adopts the label most frequent among its neighbors,
    * ties broken by SMALLEST label; all nodes update simultaneously
    * from the previous round's labels (the asynchronous/random-order
    * variants converge faster but are non-reproducible — a
    * deterministic engine can't ship them). Runs a FIXED `iters`
    * rounds; the per-round label table is localCheckpointed so plan
    * depth and lineage stay O(1) per round.
    *
    * Per round: one join of the pre-partitioned symmetrized edge list
    * ([[GraphFace.sym]] — the label side alone exchanges, node-sized)
    * against the label table, a (node, label) count, and a max-struct
    * argmax — max(struct(cnt, −label)) picks highest count then
    * lowest label without a per-node sort window.
    *
    * Output: (node, label) for every node of the canonicalized graph.
    */
  /** The shared argmax: most-frequent label per node from (nodeCol,
    * label) rows, ties to the SMALLEST label. Two codegen'd hash
    * aggregates by default; `useMode` collapses them into one
    * deterministic mode() (ObjectHashAggregate) — built for the A/B,
    * measured slower at sf1 (BENCH_SCALE §LPA-MODE), kept as the
    * probe face. */
  private def argmaxLabel(joined: DataFrame, nodeCol: String, useMode: Boolean): DataFrame =
    if (useMode)
      joined.groupBy(col(nodeCol))
        .agg(mode(col("label"), deterministic = true).as("label"))
        .select(col(nodeCol).as("node"), col("label"))
    else
      joined.groupBy(col(nodeCol), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col(nodeCol))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col(nodeCol).as("node"), (-col("m.nl")).as("label"))

  /** Synchronous LPA on the driver — exact twin of the dense rounds
    * below: every node simultaneously adopts its neighbors' most
    * frequent previous-round label, ties to the SMALLEST label;
    * stops early when a round changes nothing (identical output — the
    * remaining rounds are no-ops, same as the distributed
    * converged exit). */
  private def lpaDriver(f: GraphFace, iters: Int): Option[DataFrame] = {
    val nodeType = f.canonical.schema.head.dataType
    if (!integralNodeType(nodeType)) return None
    val edges = collectCanonical(f)
    val idx = new scala.collection.mutable.LongMap[Int]()
    edges.foreach { case (a, b) =>
      if (!idx.contains(a)) idx(a) = idx.size
      if (!idx.contains(b)) idx(b) = idx.size
    }
    val n = idx.size
    val ids = new Array[Long](n)
    idx.foreach { case (id, i) => ids(i) = id }
    val degArr = new Array[Int](n)
    edges.foreach { case (a, b) => degArr(idx(a)) += 1; degArr(idx(b)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + degArr(i); i += 1 }
    val nbr = new Array[Int](2 * edges.length)
    val fill = java.util.Arrays.copyOf(off, n)
    edges.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      nbr(fill(ia)) = ib; fill(ia) += 1
      nbr(fill(ib)) = ia; fill(ib) += 1
    }
    var labels: Array[Long] = ids.clone()
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val next = new Array[Long](n)
      val counts = new scala.collection.mutable.LongMap[Long]()
      var changedAny = false
      i = 0
      while (i < n) {
        counts.clear()
        var j = off(i)
        while (j < off(i + 1)) {
          val l = labels(nbr(j))
          counts(l) = counts.getOrElse(l, 0L) + 1L
          j += 1
        }
        var bestLabel = Long.MaxValue; var bestCount = -1L
        counts.foreach { case (l, c) =>
          if (c > bestCount || (c == bestCount && l < bestLabel)) {
            bestCount = c; bestLabel = l
          }
        }
        next(i) = bestLabel
        if (bestLabel != labels(i)) changedAny = true
        i += 1
      }
      labels = next
      converged = !changedAny
    }
    val spark = f.spark
    import spark.implicits._
    val out =
      if (nodeType == org.apache.spark.sql.types.LongType)
        (0 until n).map(i => (ids(i), labels(i))).toDF("node", "label")
      else
        (0 until n).map(i => (ids(i).toInt, labels(i).toInt)).toDF("node", "label")
    Some(out)
  }

  def labelPropagation(f: GraphFace, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"labelPropagation: iters must be in [1, 20], got $iters")
    val driverMax = driverMaxEdges(f)
    if (driverMax > 0 && f.canonical.count() <= driverMax) {
      val d = lpaDriver(f, iters)
      if (d.isDefined) return d.get
    }
    val useMode = f.spark.conf.getOption("spark.graft.lpa.modeAgg").exists(_.toBoolean)
    // ADAPTIVE frontier rounds: a node's round-r label depends only on
    // its neighbors' round-(r−1) labels, so a node NONE of whose
    // neighbors changed in round r−1 would recompute exactly its
    // current label (induction: its previous recompute saw the
    // identical neighbor multiset). A round may therefore recompute
    // ONLY the neighbors of the previous round's changed set — the
    // bfsHops frontier discipline applied to LPA — with row-for-row
    // IDENTICAL output (spec-pinned). WHEN that pays is data-dependent:
    // the frontier round swaps the dense data-sized (v, label) rollup
    // for joins bounded by edges incident to affected nodes, PLUS an
    // affected-distinct and a node-sized label merge — a win only once
    // the changed set has genuinely collapsed. Measured on the sf1
    // co-occurrence graph at iters=3 the label field does NOT settle
    // (changed: 200k → 150k → 146k of 200k nodes), so always-frontier
    // ran ~7% SLOWER than dense (BENCH_SCALE §LPA-FRONTIER); on
    // stabilizing graphs (the common LPA regime past a few rounds) the
    // delta rounds approach free. Hence adaptive: run the frontier
    // round iff |changed| < frontierFraction · |nodes| (default 0.25,
    // `spark.graft.lpa.frontierFraction`; 0 disables — the dense A/B
    // face; the changed-set bookkeeping is a node-sized join per
    // round, noise next to the edge-sized rollup it can retire). An
    // empty changed set ends the loop — every later round is a no-op.
    val frontierFraction = f.spark.conf
      .getOption("spark.graft.lpa.frontierFraction").map(_.toDouble).getOrElse(0.25)
    val useFrontier = frontierFraction > 0
    // Dense-round exchange budget. The naive round pays TWO data-sized
    // exchanges (the (v, label) rollup, then the per-node argmax).
    //   - BROADCAST rounds (node table ≤ broadcastNodesMax, default
    //     4M — a few-hundred-MB ceiling): join the labels onto the
    //     NEIGHBOR column v of the u-partitioned sym and aggregate on
    //     u. By symmetry that computes exactly each node's neighbor-
    //     label histogram, and u IS the checkpoint's partition key, so
    //     the rollup AND the argmax run in place: ZERO exchanges per
    //     round beyond the node-sized broadcast itself.
    //   - SHUFFLE rounds (the 100 TB path, node table too big to
    //     broadcast): keep the u-side hash join (label side alone
    //     exchanges, node-sized) but repartition the joined stream by
    //     v ONCE — HashPartitioning(v) satisfies both the (v, label)
    //     rollup and the argmax, so the two aggregations ride ONE
    //     data-sized exchange instead of two. (The exchange carries
    //     raw pairs instead of map-side partials; on a near-regular
    //     graph the combine ratio was negligible anyway.)
    // Identical results either way — same join semantics, same
    // multiset into the same argmax (spec-pinned across both paths).
    val broadcastMax = f.spark.conf
      .getOption("spark.graft.lpa.broadcastNodesMax").map(_.toLong).getOrElse(4000000L)
    lazy val nNodes = f.deg.count()
    var labels = f.deg
      .select(col("node"), col("node").as("label"))
      .ckKeepPartitioning
    var changed: DataFrame = null // valid after round 1 (frontier mode)
    var changedCount = Long.MaxValue
    var converged = false
    for (r <- 1 to iters if !converged) {
      if (r == 1 || !useFrontier || changedCount >= frontierFraction * nNodes) {
        // dense round: every node recomputes
        val next = if (nNodes <= broadcastMax)
          argmaxLabel(
            f.sym.join(broadcast(labels.select(col("node").as("v"), col("label"))), "v"),
            "u", useMode)
        else
          argmaxLabel(
            f.sym.join(labels.select(col("node").as("u"), col("label"))
              .hint("shuffle_hash"), "u")
              .repartition(col("v")),
            "v", useMode)
        if (useFrontier) {
          // the changed flag rides the round's ONE checkpoint (the
          // old-label join is node-sized and co-partitioned, so it
          // folds into the materialization); the count is a cheap
          // aggregate over the checkpoint and the changed SET is a
          // free filter over it — the previous shape materialized a
          // second node-sized checkpoint per round just for the set
          val tagged = next.join(
            labels.select(col("node"), col("label").as("_old")).hint("shuffle_hash"),
            "node")
            .select(col("node"), col("label"),
              (col("label") =!= col("_old")).as("_chg"))
            .ckKeepPartitioning
          changed = tagged.filter(col("_chg")).select(col("node"))
          changedCount = tagged
            .agg(count(when(col("_chg"), 1)).as("c")).collect()(0).getLong(0)
          converged = changedCount == 0
          labels = tagged.select(col("node"), col("label"))
        } else {
          labels = next.ckKeepPartitioning
        }
      } else {
        // neighbors of the changed set — the only nodes whose argmax
        // input multiset differs from their last recompute
        val affected = f.sym
          .join(changed.select(col("node").as("u")).hint("shuffle_hash"), "u")
          .select(col("v").as("node")).distinct()
        // their FULL neighborhoods (sym holds both directions, so
        // u ∈ affected rows enumerate every neighbor), labeled
        val subEdges = f.sym
          .join(affected.select(col("node").as("u")).hint("shuffle_hash"), "u")
        val joined = subEdges
          .join(labels.select(col("node").as("v"), col("label")).hint("shuffle_hash"), "v")
        val newAffected = argmaxLabel(joined, "u", useMode)
          .withColumnRenamed("label", "_new")
        val merged = labels
          .join(newAffected.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("_new"), col("label")).as("label"),
            (col("_new").isNotNull && col("_new") =!= col("label")).as("_chg"))
          .ckKeepPartitioning
        changed = merged.filter(col("_chg")).select(col("node"))
        changedCount = changed.count()
        converged = changedCount == 0
        labels = merged.select(col("node"), col("label"))
      }
    }
    labels
  }

  def labelPropagation(edges: DataFrame, srcCol: String = "src",
                       dstCol: String = "dst", iters: Int = 3,
                       assumeCanonical: Boolean = false): DataFrame =
    labelPropagation(face(edges, srcCol, dstCol, assumeCanonical), iters)

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
    * Per round: ONE frontier probe of the pre-partitioned
    * [[GraphFace.sym]] (only the node-sized frontier exchanges), a
    * distinct on the discovered nodes, and a LEFT ANTI against the
    * visited set. On a 100 TB graph each round's exchanges are bounded
    * by the frontier's node count, never re-expanding the full edge
    * set. Frontier tables are localCheckpointed per round (bounded
    * lineage).
    *
    * Output: (node, hop), one row per reached node. */
  /** Long-or-int node column support for the driver graph paths: the
    * driver twins must emit the SAME schema the distributed path
    * would, so they only engage for integral node types and rebuild
    * typed local relations; anything else stays distributed. */
  private def integralNodeType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.LongType ||
      dt == org.apache.spark.sql.types.IntegerType

  /** Both endpoint columns of the canonical edge table are integral —
    * the precondition for EVERY driver graph twin: collectCanonical
    * casts node ids to long, so a non-integral node column (string ids
    * cast to NULL and read back as 0, double/decimal ids truncate)
    * would silently collapse distinct nodes. Non-integral graphs stay
    * on the type-generic distributed paths. */
  private def integralEndpoints(f: GraphFace): Boolean = {
    val s = f.canonical.schema
    s.length >= 2 && integralNodeType(s(0).dataType) && integralNodeType(s(1).dataType)
  }

  /** BFS on the driver — exact twin of the frontier rounds below:
    * hop 0 = the distinct seed set (including seeds with no edges),
    * hop r = unvisited neighbors of the previous frontier. */
  private def bfsHopsDriver(f: GraphFace, seeds: DataFrame, seedCol: String,
                            rounds: Int): Option[DataFrame] = {
    val seedDf = seeds.select(col(seedCol).as("node")).distinct()
    val nodeType = seedDf.schema.head.dataType
    if (!integralNodeType(nodeType) || !integralEndpoints(f) ||
        f.canonical.schema.head.dataType != nodeType) return None
    // a NULL seed survives distinct() as one row; in the distributed
    // path it is an inert (NULL, 0) row (NULL never equi-joins sym) —
    // mirror that here instead of letting getLong read NULL as node 0
    val seedRows = seedDf.select(col("node").cast("long")).collect()
    val nullSeed = seedRows.exists(_.isNullAt(0))
    val seedVals = seedRows.filterNot(_.isNullAt(0)).map(_.getLong(0))
    val edges = collectCanonical(f)
    val adjacency = new scala.collection.mutable.LongMap[scala.collection.mutable.ArrayBuffer[Long]]()
    edges.foreach { case (a, b) =>
      adjacency.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      adjacency.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    val dist = new scala.collection.mutable.LongMap[Int]()
    var frontier = seedVals.toSeq
    frontier.foreach(s => dist(s) = 0)
    for (r <- 1 to rounds) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Long]
      frontier.foreach { u =>
        adjacency.get(u).foreach(_.foreach { v =>
          if (!dist.contains(v)) { dist(v) = r; next += v }
        })
      }
      frontier = next.toSeq
    }
    val spark = f.spark
    import spark.implicits._
    val out =
      if (nodeType == org.apache.spark.sql.types.LongType) {
        val rows = dist.toSeq.map { case (n, h) => (Option(n), h) } ++
          (if (nullSeed) Seq((Option.empty[Long], 0)) else Nil)
        rows.toDF("node", "hop")
      } else {
        val rows = dist.toSeq.map { case (n, h) => (Option(n.toInt), h) } ++
          (if (nullSeed) Seq((Option.empty[Int], 0)) else Nil)
        rows.toDF("node", "hop")
      }
    Some(out)
  }

  def bfsHops(f: GraphFace, seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"bfsHops: rounds must be in [1, 20], got $rounds")
    val driverMax = driverMaxEdges(f)
    if (driverMax > 0 && f.canonical.count() <= driverMax) {
      val d = bfsHopsDriver(f, seeds, seedCol, rounds)
      if (d.isDefined) return d.get
    }
    // only each round's FRONTIER is materialized; the visited set is
    // the union of the already-checkpointed round tables (O(rounds)
    // plan width, zero recompute) — re-materializing the whole
    // distance table every round would write the cumulative reachable
    // set `rounds` times over
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0)).ckKeepPartitioning
    var frontier = dist.select(col("node"))
    for (r <- 1 to rounds) {
      val next = f.sym
        .join(frontier.select(col("node").as("u")).hint("shuffle_hash"), "u")
        .select(col("v").as("node")).distinct()
        .join(dist.select(col("node")).hint("shuffle_hash"), Seq("node"), "left_anti")
        .withColumn("hop", lit(r))
        .ckKeepPartitioning
      dist = dist.unionAll(next)
      frontier = next.select(col("node"))
    }
    dist
  }

  def bfsHops(edges: DataFrame, seeds: DataFrame, srcCol: String = "src",
              dstCol: String = "dst", seedCol: String = "node",
              rounds: Int = 3, assumeCanonical: Boolean = false): DataFrame =
    bfsHops(face(edges, srcCol, dstCol, assumeCanonical), seeds, seedCol, rounds)

  /** The k-core peel loop shared by [[kcorePeel]] (fixed rounds) and
    * [[kcoreFixpoint]] (run to stability): INCREMENTAL degree
    * maintenance. Each round removes every node currently below `k`
    * and updates the SURVIVORS' degrees by subtracting their edges to
    * the removed set — the degree of a survivor in the induced
    * subgraph is exactly its old degree minus its removed neighbors,
    * so no edge table is ever rewritten and no degree is ever
    * recomputed from scratch (the previous shape paid two edge-table
    * semi-joins + an edge-set checkpoint + a full degree rollup per
    * round; this one pays one probe of the pre-partitioned
    * [[GraphFace.sym]] by the removed set — delta-sized build side,
    * zero edge-side exchange — one loss rollup bounded by the edges
    * INCIDENT TO REMOVED nodes, and node-sized colocated updates).
    * Nodes whose degree reaches 0 leave the table, matching the
    * recomputed-degree semantics (a zero-degree node carries no edge).
    * The per-round deg table is localCheckpointed (bounded lineage);
    * round stats (n_nodes = rows, n_edges = Σdeg/2) come from the
    * node-sized table with no extra pass over edges.
    *
    * The trajectory is row-for-row identical to the old
    * recompute-from-edges loop — both compute degrees of the induced
    * surviving subgraph; only the maintenance is incremental. */
  /** Edge-count gate for the driver-iterated graph operators (k-core,
    * k-truss, BFS, LPA): graphs whose CANONICAL edge table is at or
    * under this many rows collect once (≤ ~32 MB of id pairs at the
    * default) and iterate in exact integer arithmetic on the driver —
    * the per-round state of these operators is node- or
    * trajectory-sized, and at gate-sized graphs the distributed
    * rounds are almost pure stage-job scheduling (the textrank/ktruss
    * r14 lesson). 0 disables (the distributed parity face); results
    * are identical either way — each operator is a pure integer
    * function of the edge set (spec-pinned equality per operator).
    * Conf `spark.graft.graph.driverMaxEdges`; the transitional r15
    * name `…driverPeelMaxEdges` is honored when the new one is
    * unset. */
  private def driverMaxEdges(f: GraphFace): Long = f.spark.conf
    .getOption("spark.graft.graph.driverMaxEdges")
    .orElse(f.spark.conf.getOption("spark.graft.graph.driverPeelMaxEdges"))
    .map(_.toLong)
    .getOrElse(2000000L)

  /** Collected canonical edges as id pairs (lossless long casts). */
  private def collectCanonical(f: GraphFace): Array[(Long, Long)] =
    f.canonical.select(col("a").cast("long"), col("b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** The k-core peel on the driver — the exact integer twin of the
    * distributed round below: same per-round removed set (deg < k over
    * the CURRENT survivors), same loss accounting (each removed node
    * decrements its surviving neighbors once per incident edge), same
    * deg > 0 survival filter, same (n_nodes, Σdeg/2) trajectory row. */
  private def kcoreLoopDriver(edges: Array[(Long, Long)], k: Int, maxRounds: Int,
                              stopWhenStable: Boolean): (Seq[(Int, Long, Long)], Boolean, Int) = {
    // index nodes; CSR adjacency over both directions
    val idx = new scala.collection.mutable.LongMap[Int]()
    edges.foreach { case (a, b) =>
      if (!idx.contains(a)) idx(a) = idx.size
      if (!idx.contains(b)) idx(b) = idx.size
    }
    val n = idx.size
    val degArr = new Array[Long](n)
    edges.foreach { case (a, b) => degArr(idx(a)) += 1; degArr(idx(b)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + degArr(i).toInt; i += 1 }
    val nbr = new Array[Int](2 * edges.length)
    val fill = java.util.Arrays.copyOf(off, n)
    edges.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      nbr(fill(ia)) = ib; fill(ia) += 1
      nbr(fill(ib)) = ia; fill(ib) += 1
    }
    val alive = new Array[Boolean](n); java.util.Arrays.fill(alive, true)
    val deg = degArr.clone()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var prev: Option[(Long, Long)] = None
    var stable = false
    var r = 0
    while (r < maxRounds && !(stopWhenStable && stable)) {
      r += 1
      val removed = (0 until n).filter(v => alive(v) && deg(v) < k)
      removed.foreach { v => alive(v) = false }
      removed.foreach { v =>
        var j = off(v)
        while (j < off(v + 1)) {
          val w = nbr(j)
          if (alive(w)) deg(w) -= 1
          j += 1
        }
      }
      var nn = 0L; var s = 0L
      i = 0
      while (i < n) {
        if (alive(i)) {
          if (deg(i) > 0) { nn += 1; s += deg(i) } else alive(i) = false
        }
        i += 1
      }
      val cur = (nn, s / 2)
      buf += ((r, nn, s / 2))
      stable = prev.contains(cur)
      prev = Some(cur)
    }
    (buf.toSeq, stable, r)
  }

  private def kcoreLoop(f: GraphFace, k: Int, maxRounds: Int,
                        stopWhenStable: Boolean): (Seq[(Int, Long, Long)], Boolean, Int) = {
    val driverMax = driverMaxEdges(f)
    if (driverMax > 0 && integralEndpoints(f) && f.canonical.count() <= driverMax)
      return kcoreLoopDriver(collectCanonical(f), k, maxRounds, stopWhenStable)
    var deg = f.deg
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var prev: Option[(Long, Long)] = None
    var stable = false
    var r = 0
    while (r < maxRounds && !(stopWhenStable && stable)) {
      r += 1
      val removed = deg.filter(col("deg") < k).select(col("node"))
      val losses = f.sym
        .join(removed.select(col("node").as("u")).hint("shuffle_hash"), "u")
        .groupBy(col("v")).agg(count(lit(1)).as("_loss"))
      deg = deg
        .join(removed.hint("shuffle_hash"), Seq("node"), "left_anti")
        .join(losses.select(col("v").as("node"), col("_loss")).hint("shuffle_hash"),
          Seq("node"), "left")
        .select(col("node"),
          (col("deg") - coalesce(col("_loss"), lit(0L))).as("deg"))
        .filter(col("deg") > 0)
        .ckKeepPartitioning
      val st = deg.agg(count(lit(1)).as("n"),
        coalesce(sum(col("deg")), lit(0L)).cast("bigint").as("s")).collect()(0)
      val cur = (st.getLong(0), st.getLong(1) / 2)
      buf += ((r, cur._1, cur._2))
      stable = prev.contains(cur)
      prev = Some(cur)
    }
    (buf.toSeq, stable, r)
  }

  /** Fixed-round k-core peeling trajectory (see [[kcoreLoop]] for the
    * incremental per-round shape). True k-core iterates to a fixpoint
    * ([[kcoreFixpoint]]); a FIXED round count keeps the result
    * reproducible and the plan statically bounded — callers read the
    * trajectory to see whether it stabilized (equal rows) or was
    * still cascading.
    *
    * Output: one row per round — `round`, `n_nodes` (nodes still
    * carrying an edge), `n_edges`. */
  def kcorePeel(f: GraphFace, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"kcorePeel: k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 10, s"kcorePeel: rounds must be in [1, 10], got $rounds")
    val (buf, _, _) = kcoreLoop(f, k, rounds, stopWhenStable = false)
    val spark = f.spark
    import spark.implicits._
    buf.toDF("round", "n_nodes", "n_edges")
  }

  def kcorePeel(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                k: Int = 2, rounds: Int = 3,
                assumeCanonical: Boolean = false): DataFrame =
    kcorePeel(face(edges, srcCol, dstCol, assumeCanonical), k, rounds)

  /** Iterate-to-fixpoint k-core: [[kcoreLoop]] run until a round peels
    * nothing (consecutive (n_nodes, n_edges) equal — the true k-core),
    * up to `maxRounds`. No extra convergence job: the loop already
    * collects a 1-row stats table per round for the trajectory, so the
    * fixpoint test is a driver-side equality on numbers it was
    * computing anyway. Throws if `maxRounds` rounds don't stabilize —
    * a partially-peeled core is not detectably different downstream,
    * so fail loudly (the pageRankConverged / CC-loop contract).
    *
    * Output: (trajectory DataFrame — same schema as kcorePeel, ending
    * at the first stable round —, rounds actually run). */
  def kcoreFixpoint(f: GraphFace, k: Int, maxRounds: Int): (DataFrame, Int) = {
    require(k >= 1, s"kcoreFixpoint: k must be >= 1, got $k")
    require(maxRounds >= 1 && maxRounds <= 1000,
      s"kcoreFixpoint: maxRounds must be in [1, 1000], got $maxRounds")
    val (buf, stable, r) = kcoreLoop(f, k, maxRounds, stopWhenStable = true)
    if (!stable) throw new IllegalStateException(
      s"kcoreFixpoint: still peeling after $maxRounds rounds; raise maxRounds")
    val spark = f.spark
    import spark.implicits._
    (buf.toDF("round", "n_nodes", "n_edges"), r)
  }

  def kcoreFixpoint(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                    k: Int = 2, maxRounds: Int = 50,
                    assumeCanonical: Boolean = false): (DataFrame, Int) =
    kcoreFixpoint(face(edges, srcCol, dstCol, assumeCanonical), k, maxRounds)

  /** k-truss peeling trajectory — the EDGE-strength sibling of
    * [[kcorePeel]] (Cohen 2008): each round computes every edge's
    * triangle support and deletes edges supported by fewer than k−2
    * triangles; what survives all rounds is tending to the k-truss,
    * the standard cohesive-subgraph definition one notch stronger than
    * the k-core (every surviving relationship is REINFORCED by ≥ k−2
    * common neighbors, not merely incident to a busy node).
    *
    * Triangles are enumerated ONCE, on the initial graph — the shared
    * [[GraphFace.triples]] face (a workload that also ran
    * [[triangleStats]] has the orientation + adjacency builds already
    * paid) — edge deletion can never CREATE a triangle, so every later
    * round's triangle set is exactly the alive subset (all three edges
    * surviving), maintained by three composite-key semi-joins per
    * round instead of a re-enumeration (the re-enumerating variant
    * measured 53.2 vs 27.1 s at sf1 — the co-occurrence graph keeps
    * ~40% of its edges through the peel, so a re-enumeration repays
    * most of the round-1 cost every round while the semi-joins only
    * shuffle shrinking id triples; deletion can't create triangles, so
    * both shapes are exact). Edge/support/triple tables are
    * localCheckpointed per round (the kcore bounded-lineage
    * discipline); n_triangles falls out of the support sum (Σsup = 3Δ)
    * with no extra pass.
    *
    * Output: one row per round — (round, n_edges entering the round,
    * n_triangles on that edge set, n_removed by the round's peel). */
  /** The k-truss peel on the driver — the exact integer twin of the
    * distributed rounds below. Triangles are enumerated once on the
    * initial graph via the same compact-forward orientation the face
    * uses (the triangle SET of a graph is unique, so enumeration
    * method is immaterial); each round recounts per-edge support over
    * the alive triples, removes sup < k−2 edges, and kills triples
    * with a dead edge — the identical trajectory algebra
    * ((round, entering edges, Σsup/3 = alive triples, removed)). */
  private def ktrussPeelDriver(edges: Array[(Long, Long)], k: Int, rounds: Int,
                               maxTriangles: Long): Option[Seq[(Int, Long, Long, Long)]] = {
    val idx = new scala.collection.mutable.LongMap[Int]()
    edges.foreach { case (a, b) =>
      if (!idx.contains(a)) idx(a) = idx.size
      if (!idx.contains(b)) idx(b) = idx.size
    }
    val n = idx.size
    val ids = new Array[Long](n)
    idx.foreach { case (id, i) => ids(i) = id }
    val degArr = new Array[Int](n)
    edges.foreach { case (a, b) => degArr(idx(a)) += 1; degArr(idx(b)) += 1 }
    // edge index by endpoint pair (a < b by original id), keyed on the
    // two PACKED node indices (each < n ≤ 2·edges, always an Int) —
    // one primitive LongMap entry per edge, no boxed tuple keys
    val eIdx = new scala.collection.mutable.LongMap[Int](edges.length * 2)
    @inline def eKey(loId: Long, hiId: Long): Long =
      (idx(loId).toLong << 32) | (idx(hiId).toLong & 0xffffffffL)
    var i = 0
    while (i < edges.length) {
      eIdx(eKey(edges(i)._1, edges(i)._2)) = i; i += 1
    }
    // compact-forward orientation: lower (deg, id) endpoint → other;
    // out-lists sorted by ORIGINAL id for the two-pointer intersect
    val outDeg = new Array[Int](n)
    edges.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      val aLow = degArr(ia) < degArr(ib) || (degArr(ia) == degArr(ib) && a < b)
      outDeg(if (aLow) ia else ib) += 1
    }
    val oOff = new Array[Int](n + 1)
    i = 0
    while (i < n) { oOff(i + 1) = oOff(i) + outDeg(i); i += 1 }
    val oNbr = new Array[Long](edges.length)
    val oFill = java.util.Arrays.copyOf(oOff, n)
    edges.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      val aLow = degArr(ia) < degArr(ib) || (degArr(ia) == degArr(ib) && a < b)
      val s = if (aLow) ia else ib
      oNbr(oFill(s)) = if (aLow) b else a
      oFill(s) += 1
    }
    i = 0
    while (i < n) {
      java.util.Arrays.sort(oNbr, oOff(i), oOff(i + 1)); i += 1
    }
    // one (e1, e2, e3) row per triangle, as edge indices in a FLAT
    // primitive int array (3 slots per triangle) — the boxed-tuple
    // buffer was O(#triangles) of tuple objects, which a dense
    // sub-2M-edge graph can blow past the heap with. The same density
    // hazard motivates the maxTriangles bail-out: the edge GATE bounds
    // edge count, not triangle count (a ~2000-node near-clique under
    // the gate has ~1.3e9 triangles), so enumeration aborts to the
    // spilling distributed peel once the cap is crossed.
    val trisB = new scala.collection.mutable.ArrayBuilder.ofInt
    var nTris = 0L
    var aborted = false
    val eIt = edges.iterator
    while (eIt.hasNext && !aborted) {
      val (a, b) = eIt.next()
      val ia = idx(a); val ib = idx(b)
      val aLow = degArr(ia) < degArr(ib) || (degArr(ia) == degArr(ib) && a < b)
      val s = if (aLow) ia else ib
      val dId = if (aLow) b else a
      val d = idx(dId)
      var p = oOff(s); var q = oOff(d)
      while (p < oOff(s + 1) && q < oOff(d + 1) && !aborted) {
        val x = oNbr(p); val y = oNbr(q)
        if (x == y) {
          val sId = ids(s)
          val ta = math.min(math.min(sId, dId), x)
          val tc = math.max(math.max(sId, dId), x)
          // median-of-3, NOT the sum identity — same overflow caution
          // as GraphFace.triples
          val tb = math.max(math.min(sId, dId),
            math.min(math.max(sId, dId), x))
          trisB += eIdx(eKey(ta, tb)); trisB += eIdx(eKey(ta, tc)); trisB += eIdx(eKey(tb, tc))
          nTris += 1
          if (nTris > maxTriangles) aborted = true
          p += 1; q += 1
        } else if (x < y) p += 1 else q += 1
      }
    }
    if (aborted) return None
    val tris = trisB.result()
    val nT = (tris.length / 3)
    val eAlive = new Array[Boolean](edges.length)
    java.util.Arrays.fill(eAlive, true)
    val tAlive = new Array[Boolean](nT)
    java.util.Arrays.fill(tAlive, true)
    var nTriAlive = nT.toLong
    var ne = edges.length.toLong
    val sup = new Array[Long](edges.length)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    for (r <- 1 to rounds) {
      java.util.Arrays.fill(sup, 0L)
      var t = 0
      while (t < nT) {
        if (tAlive(t)) {
          sup(tris(3 * t)) += 1; sup(tris(3 * t + 1)) += 1; sup(tris(3 * t + 2)) += 1
        }
        t += 1
      }
      var kept = 0L
      i = 0
      while (i < edges.length) {
        if (eAlive(i) && sup(i) >= (k - 2).toLong) kept += 1
        i += 1
      }
      buf += ((r, ne, nTriAlive, ne - kept))
      if (r < rounds) {
        i = 0
        while (i < edges.length) {
          if (eAlive(i) && sup(i) < (k - 2).toLong) eAlive(i) = false
          i += 1
        }
        t = 0
        while (t < nT) {
          if (tAlive(t)) {
            if (!eAlive(tris(3 * t)) || !eAlive(tris(3 * t + 1)) || !eAlive(tris(3 * t + 2))) {
              tAlive(t) = false; nTriAlive -= 1
            }
          }
          t += 1
        }
        ne = kept
      }
    }
    Some(buf.toSeq)
  }

  def ktrussPeel(f: GraphFace, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"ktrussPeel: k must be >= 3, got $k")
    require(rounds >= 1 && rounds <= 10, s"ktrussPeel: rounds must be in [1, 10], got $rounds")
    val driverMax = driverMaxEdges(f)
    if (driverMax > 0 && integralEndpoints(f) && f.canonical.count() <= driverMax) {
      // the edge gate does not bound triangle count, so the driver
      // twin additionally caps enumerated triangles (flat int storage,
      // ~12 B/triangle: the 30M default is ~360 MB transient) and
      // falls through to the spilling distributed peel past the cap
      val maxTris = f.spark.conf
        .getOption("spark.graft.graph.driverMaxTriangles")
        .map(_.toLong).getOrElse(30000000L)
      ktrussPeelDriver(collectCanonical(f), k, rounds, maxTris) match {
        case Some(buf) =>
          val spark = f.spark
          import spark.implicits._
          return buf.toDF("round", "n_edges", "n_triangles", "n_removed")
            .select(col("round").cast("int").as("round"), col("n_edges"),
              col("n_triangles"), col("n_removed"))
        case None => // triangle cap crossed — distributed peel below
      }
    }
    // Per-round checkpoints are SIZE-GATED between the two materialization
    // modes (the r13/r14 adjudication): AQE-off (partitioning-preserving,
    // fixed partition count) only once the round's edge table is large
    // enough that the preserved layout retires real re-exchanges; below
    // the gate the round tables keep AQE, whose partition coalescing
    // dominates on tiny tables (the dedupClusters CC-pair pathology —
    // fixed 32-partition rounds on a 133k-edge sf0.1 graph measured
    // 2.0x the plain-checkpoint floor, while the 1.33M-edge sf1 graph
    // runs 2.1x FASTER with partitioning kept). The gate rides the
    // `ne` count each round already pays for the trajectory row.
    val aqeOffMinRows = f.spark.conf
      .getOption("spark.graft.graph.roundCkAqeOffMinRows").map(_.toLong).getOrElse(500000L)
    // THREE jobs per round, not six (the r14 adjudication — at sf0.1
    // the peel was scheduling-bound, ~6 tiny jobs x 3 rounds):
    //  1. materialize eSup = edges LEFT JOIN their support rollup —
    //     ONE table carrying both the survivor set (filter sup >= k−2,
    //     a free projection over the checkpoint) and the trajectory
    //     inputs, where the old shape materialized sup and the
    //     filtered e separately;
    //  2. one fused 1-row aggregate: Σsup (= 3Δ, n_triangles) and the
    //     survivor count in the same pass — and that count IS the next
    //     round's n_edges, so no round re-counts the table the
    //     previous round already counted;
    //  3. materialize the alive-triple maintenance (unchanged).
    // The LAST round skips both materializations: its trajectory row
    // needs only the fused aggregate, evaluated in one unmaterialized
    // pass. At scale the fused table is strictly cheaper too: one
    // edge-sized write per round instead of two.
    var e = f.canonical
    var alive = f.triples
    var ne = e.count()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    for (r <- 1 to rounds) {
      def ckRound(df: DataFrame): DataFrame =
        if (ne >= aqeOffMinRows) df.ckKeepPartitioning else df.localCheckpoint()
      val sup = alive
        .select(explode(array(
          struct(col("ta").as("ea"), col("tb").as("eb")),
          struct(col("ta").as("ea"), col("tc").as("eb")),
          struct(col("tb").as("ea"), col("tc").as("eb")))).as("p"))
        .select(col("p.ea").as("a"), col("p.eb").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup"))
      val eSup0 = e.join(sup, Seq("a", "b"), "left")
        .select(col("a"), col("b"), coalesce(col("sup"), lit(0L)).as("sup"))
      val eSup = if (r < rounds) ckRound(eSup0) else eSup0
      val st = eSup.agg(
        coalesce(sum(col("sup")), lit(0L)).cast("bigint").as("s"),
        count(when(col("sup") >= (k - 2).toLong, 1)).as("kept")).collect()(0)
      val (nTri, nKept) = (st.getLong(0) / 3, st.getLong(1))
      buf += ((r, ne, nTri, ne - nKept))
      if (r < rounds) {
        e = eSup.filter(col("sup") >= (k - 2).toLong).select(col("a"), col("b"))
        ne = nKept
        alive = ckRound(alive
          .join(e.select(col("a").as("ta"), col("b").as("tb")).hint("shuffle_hash"),
            Seq("ta", "tb"), "left_semi")
          .join(e.select(col("a").as("ta"), col("b").as("tc")).hint("shuffle_hash"),
            Seq("ta", "tc"), "left_semi")
          .join(e.select(col("a").as("tb"), col("b").as("tc")).hint("shuffle_hash"),
            Seq("tb", "tc"), "left_semi"))
      }
    }
    val spark = f.spark
    import spark.implicits._
    buf.toSeq.toDF("round", "n_edges", "n_triangles", "n_removed")
      .select(col("round").cast("int").as("round"), col("n_edges"),
        col("n_triangles"), col("n_removed"))
  }

  def ktrussPeel(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
                 k: Int = 6, rounds: Int = 3,
                 assumeCanonical: Boolean = false): DataFrame =
    ktrussPeel(face(edges, srcCol, dstCol, assumeCanonical), k, rounds)

  /** One-row structural summary: node/edge counts, degree min/max/mean,
    * and the degree assortativity coefficient — Newman 2002's r, the
    * Pearson correlation of (deg u, deg v) over all DIRECTED edge
    * occurrences. With identical marginals (every undirected edge
    * contributes both orientations) the sqrt-free form is exact:
    *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²),   M = 2·edges,
    * where Σx = Σ deg², Σx² = Σ deg³ come from the degree table alone
    * and only Σxy needs the per-edge deg·deg join (both lookups ride
    * the shared checkpointed [[GraphFace.deg]]). The three final
    * products can pass 2⁶³ on large graphs, so they are computed in
    * DECIMAL(38,0) (exact; the oracle uses HUGEINT — same integers),
    * and r is ONE exactly-rounded IEEE division at the end. A regular
    * graph has zero degree variance — r is defined as 0.0 there. */
  def graphStats(f: GraphFace): DataFrame = {
    val degAgg = f.deg.agg(
      count(lit(1)).as("n_nodes"),
      min(col("deg")).as("min_deg"),
      max(col("deg")).as("max_deg"),
      sum(col("deg")).cast("bigint").as("sum_deg"),
      sum(col("deg").cast("decimal(19,0)") * col("deg").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("sx"),
      sum(col("deg").cast("decimal(19,0)") * col("deg").cast("decimal(19,0)")
        * col("deg").cast("decimal(19,0)")).cast("decimal(38,0)").as("sxx"))
    val prodAgg = f.canonical
      .join(f.deg.select(col("node").as("a"), col("deg").as("da")).hint("shuffle_hash"), "a")
      .join(f.deg.select(col("node").as("b"), col("deg").as("db")).hint("shuffle_hash"), "b")
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

  def graphStats(edges: DataFrame, srcCol: String = "src",
                 dstCol: String = "dst",
                 assumeCanonical: Boolean = false): DataFrame =
    graphStats(face(edges, srcCol, dstCol, assumeCanonical))
}
