package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: builds sfN data from sf0.1 by unioning K
  * key-shifted copies (K=10 → sf1). Used ONLY for the local
  * scale-validation bench (VERDICT r3 #6) — the driver's own testdata
  * is read-only and its generator is not available here, so instead of
  * guessing its distributions we replicate them exactly.
  *
  * Design constraints the copies must respect, so that per-query cost
  * scales the way a REAL 10x corpus would:
  *
  *  - Every id column shifts by `copy * KeyStride`: joins match only
  *    within a copy, so join selectivities and per-key group sizes stay
  *    constant while key cardinality grows 10x (a real bigger corpus
  *    has more users/orders, not denser ones). Copy 0 is the identity,
  *    so any literal ids referenced by catalog queries still exist.
  *  - `documents.text` is passed through a per-copy alphabet rotation
  *    (translate). Equal texts stay equal WITHIN a copy, but exact and
  *    near-dup (shingle-level) groups never merge ACROSS copies —
  *    otherwise every dup group would grow 10x and pair-quadratic
  *    operators would be forced super-linear by construction, which is
  *    not what a bigger real corpus does. Lengths and word shapes are
  *    preserved (n_chars stays truthful).
  *  - `embeddings.embedding` gets a per-copy deterministic sign-flip
  *    pattern: flipping the SAME coordinates of every vector in a copy
  *    preserves all within-copy dot products and norms exactly (the
  *    copy's kNN/near-dup geometry is bit-identical) while making
  *    cross-copy cosines behave like unrelated vectors, so ANN
  *    candidate buckets grow in count, not in density.
  *  - Dims (`region`, `nation`) stay fixed-size, as in TPC-H.
  *
  * Output layout is a directory per table (Spark-native parquet), which
  * `Tables.table` reads identically to the driver's single files.
  */
object GenData {
  private val KeyStride = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // 4th arg "clustered" plants Gaussian-ish clusters + controlled-cos
    // near-dup twins in the embeddings table (recall corpora; see
    // clusterPlant). Plain runs keep the uniform driver distribution so
    // scale ratios vs the driver's sf0.1 stay apples-to-apples.
    val clustered = args.lift(3).contains("clustered")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies, clustered)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int,
               clustered: Boolean = false): Unit = {
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // Fixed dims: byte-identical pass-through.
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    /** One scan fanned out to `copies` rows per input row via a
      * broadcast 10-row cross join; `shifted` columns get +copy*stride. */
    def scaledDf(base: DataFrame, shifted: Seq[String], extra: DataFrame => DataFrame): DataFrame = {
      val idx = broadcast(spark.range(copies).toDF("gen_copy"))
      val fanned = base.crossJoin(idx)
      val withKeys = shifted.foldLeft(fanned) { (df, c) =>
        df.withColumn(c, col(c) + col("gen_copy") * KeyStride)
      }
      extra(withKeys).select(base.columns.map(col).toIndexedSeq: _*)
    }
    def scaled(name: String, shifted: Seq[String], extra: DataFrame => DataFrame = identity): DataFrame =
      scaledDf(read(name), shifted, extra)

    write(scaled("customer", Seq("c_custkey")), "customer", 4)
    write(scaled("supplier", Seq("s_suppkey")), "supplier", 1)
    write(scaled("part", Seq("p_partkey")), "part", 2)
    write(scaled("orders", Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 32)
    write(scaled("events", Seq("event_id", "user_id")), "events", 16)

    // Per-copy alphabet rotation: copy i maps letter c -> (c+i) mod 26.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val rotText = (0 until copies).foldLeft(lit(null).cast("string")) { (acc, i) =>
      when(col("gen_copy") === i, translate(col("text"), alpha, rot(i))).otherwise(acc)
    }
    write(
      scaled("documents", Seq("doc_id"), _.withColumn("text", rotText)),
      "documents", 8)

    // Per-copy sign pattern over the 64 coords: deterministic LCG-ish
    // hash of (copy, coord); copy 0 is all +1 (identity).
    def signs(i: Int): Array[Float] =
      Array.tabulate(64) { j =>
        if (i == 0) 1.0f
        else {
          val h = (i * 2654435761L + j * 40503L) * 0x9e3779b97f4a7c15L
          if (((h >>> 17) & 1L) == 0L) 1.0f else -1.0f
        }
      }
    val flipVec = (0 until copies).foldLeft(lit(null).cast("array<float>")) { (acc, i) =>
      when(
        col("gen_copy") === i,
        zip_with(col("embedding"), lit(signs(i)), (x, s) => (x * s).cast("float"))
      ).otherwise(acc)
    }
    val embBase = if (clustered) clusterPlant(read("embeddings")) else read("embeddings")
    write(
      scaledDf(embBase, Seq("vec_id"), _.withColumn("embedding", flipVec)),
      "embeddings", 8)
  }

  /** Plant retrieval-shaped structure into the (uniform) embeddings
    * table — the corpora the ANN/near-dup operators are FOR. Uniform
    * random vectors are pairwise near-orthogonal at dim 64, which makes
    * every recall number degenerate (RECALL.md r6 had to explain
    * itself); real embedding corpora have cluster structure and true
    * near-duplicates. Deterministic, no RNG state:
    *
    *  - CLUSTERS: vector i joins cluster `xxhash64(vec_id) % 64`; its
    *    planted form is `4·(center_c + 0.8·v/|v|)` — the unit center
    *    (splitmix family, seed 20260813) plus norm-0.8 noise taken from
    *    the vector's OWN original direction, giving intra-cluster
    *    cosines ≈ 1/(1+0.8²) ≈ 0.61 and cross-cluster ≈ 0.
    *  - NEAR-DUP TWINS: ids ≡ 1 (mod 50) — 2% of the corpus — replace
    *    their vector with an EXACT-cosine rotation of (id−1)'s planted
    *    vector: w = |s|·(ŝ·cosθ + p̂·sinθ) with p̂ the unit component of
    *    the twin's own vector orthogonal to the source s, so
    *    cos(s, w) = cosθ up to float rounding. θ cycles through
    *    cos ∈ {0.99, 0.95, 0.9, 0.8} by ⌊id/50⌋ mod 4 — three levels
    *    inside the near-dup target (cos ≥ 0.9) and one designed-miss
    *    borderline.
    *
    * Runs BEFORE the per-copy fan-out, so every copy carries the same
    * planted geometry and the existing sign-flip still decorrelates
    * copies without touching within-copy cosines. */
  def clusterPlant(base: DataFrame, nClusters: Int = 64): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val dim = 64
    val dot = graft.sim.Similarity.dot _
    val flat = org.apache.spark.sql.graftext.LshBandBuckets
      .flatPlanes(dim, nClusters, seed = 20260813L)
    val centers = (0 until nClusters).map { c =>
      val v = flat.slice(c * dim, (c + 1) * dim)
      val n = math.sqrt(v.map(x => x * x).sum)
      (c, v.map(_ / n).toSeq)
    }.toDF("_cl", "_ctr")
    val vnorm = greatest(sqrt(dot(col("_vd"), col("_vd"))), lit(1e-9))
    val planted = base
      .withColumn("_vd", col("embedding").cast("array<double>"))
      .withColumn("_cl", pmod(xxhash64(col("vec_id")), lit(nClusters.toLong)).cast("int"))
      .join(broadcast(centers), "_cl")
      .withColumn("_cvec",
        zip_with(col("_ctr"), col("_vd"),
          (c, x) => (c + x * lit(0.8) / vnorm) * lit(4.0)))
    // twins: ids ≡ 1 (mod 50) re-point at (id−1)'s planted vector
    val src = planted.select(col("vec_id").as("_src_id"), col("_cvec").as("_s"))
    val cosT = element_at(
      array(lit(0.99), lit(0.95), lit(0.9), lit(0.8)),
      (pmod(floor(col("vec_id") / 50), lit(4)) + 1).cast("int"))
    val sinT = sqrt(lit(1.0) - cosT * cosT)
    val sNorm = greatest(sqrt(dot(col("_s"), col("_s"))), lit(1e-9))
    // component of the twin's own planted vector orthogonal to the source
    val perp = zip_with(col("_cvec"), col("_s"),
      (u, s) => u - s * (dot(col("_cvec"), col("_s")) / (sNorm * sNorm)))
    val perpNorm = greatest(sqrt(dot(perp, perp)), lit(1e-9))
    val twins = planted.filter(pmod(col("vec_id"), lit(50)) === 1)
      .withColumn("_src_id", col("vec_id") - 1)
      .join(src, "_src_id")
      .withColumn("_w", zip_with(col("_s"), perp,
        (s, p) => (s / sNorm * cosT + p / perpNorm * sinT) * sNorm))
      .select(col("vec_id"), col("_w").as("_out"), col("label"))
    val plain = planted.filter(pmod(col("vec_id"), lit(50)) =!= 1)
      .select(col("vec_id"), col("_cvec").as("_out"), col("label"))
    plain.unionByName(twins)
      .select(col("vec_id"),
        col("_out").cast("array<float>").as("embedding"), col("label"))
  }

  /** Deterministic POWER-LAW basket membership — the fixture TPC-H's
    * near-uniform item counts can't provide (every part sits in ~30
    * orders, so Apriori's frequent-item gate passes everything). Here
    * item popularity follows an inverse-CDF power law: item =
    * ⌊nItems · u^skew⌋ for a hash-uniform u ∈ [0,1), so at skew 3 the
    * head items appear in a large share of baskets while most of the
    * item space is singleton-rare — real transaction-log shape, where
    * the downward-closure prune collapses the pair self-join
    * superlinearly. Basket sizes cycle 1..2·avgSize−1 by basket-id
    * hash (mean ≈ avgSize). Fully hash-deterministic (xxhash64 —
    * no RNG state), so A/B runs and specs see the identical table.
    * Output: distinct (bk, it) — the membership contract
    * `associationRules(assumeDistinct = true)` expects. */
  def powerLawBaskets(spark: SparkSession, nBaskets: Long, nItems: Long,
                      avgSize: Int, skew: Double = 3.0): DataFrame = {
    require(nBaskets >= 1 && nItems >= 1 && avgSize >= 1 && skew >= 1.0)
    spark.range(nBaskets).select(col("id").as("bk"),
        explode(sequence(lit(1L),
          pmod(xxhash64(col("id")), lit(2L * avgSize - 1)) + 1L)).as("_slot"))
      .select(col("bk"),
        // u from the (bk, slot) hash, mapped through the power curve
        floor(lit(nItems) * pow(
          (pmod(xxhash64(col("bk"), col("_slot")), lit(1000000007L)).cast("double")
            / lit(1000000007.0)), lit(skew))).cast("long").as("it"))
      .distinct()
  }

  /** Power-law directed graph — the web/citation shape the PageRank
    * layout crossover has to be measured on (the test SFs top out at
    * 160k purchase-graph nodes, far under the broadcast ceiling):
    * every node 0..nNodes−1 is a source with out-degree cycling
    * 1..2·avgOutDeg−1 by id hash (mean ≈ avgOutDeg, no dangling tail
    * by construction — dangling redistribution is already spec-pinned
    * on the tiny fixture), and each destination is ⌊nNodes · u^skew⌋
    * for a hash-uniform u, so in-degree is Zipf-heavy: node 0 is the
    * hub every source cites. Same determinism contract as
    * [[powerLawBaskets]] (pure xxhash64, no RNG state): interleaved
    * A/B arms and specs see the identical edge set. Self-loops
    * dropped; output is distinct (src, dst). */
  def powerLawGraph(spark: SparkSession, nNodes: Long, avgOutDeg: Int,
                    skew: Double = 2.0): DataFrame = {
    require(nNodes >= 2 && avgOutDeg >= 1 && skew >= 1.0)
    spark.range(nNodes).select(col("id").as("src"),
        explode(sequence(lit(1L),
          pmod(xxhash64(col("id")), lit(2L * avgOutDeg - 1)) + 1L)).as("_slot"))
      .select(col("src"),
        floor(lit(nNodes) * pow(
          (pmod(xxhash64(col("src"), col("_slot")), lit(1000000007L)).cast("double")
            / lit(1000000007.0)), lit(skew))).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }
}
