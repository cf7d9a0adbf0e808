package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** The planted recall corpus (GenData clustered mode) must actually
  * have the geometry it claims: exact-cosine twins at the four target
  * levels, intra-cluster cosines well above cross-cluster, and full
  * determinism. */
class GenDataClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Uniform-ish deterministic base, shaped like the driver's
    * embeddings table (vec_id, embedding float[], label). */
  private def base(n: Int) = {
    def v(seed: Long): Array[Float] = Array.tabulate(64) { i =>
      var z = seed * 6364136223846793005L + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (((z >>> 11) * 1.1102230246251565e-16) - 0.5).toFloat
    }
    (0L until n.toLong).map(i => (i, v(i), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
  }

  private lazy val planted = GenData.clusterPlant(base(500)).cache()

  test("schema, row count, and determinism are preserved") {
    assert(planted.columns.toSeq == Seq("vec_id", "embedding", "label"))
    assert(planted.count() == 500)
    assert(planted.schema("embedding").dataType.simpleString == "array<float>")
    val again = GenData.clusterPlant(base(500))
    assert(planted.join(again, "vec_id")
      .filter(planted("embedding") =!= again("embedding")).count() == 0)
  }

  test("twins sit at their exact target cosine (float rounding only)") {
    val cosOf = planted.as("a").join(planted.as("b"),
        col("a.vec_id") === col("b.vec_id") + 1 &&
          pmod(col("a.vec_id"), lit(50)) === 1)
      .select(col("a.vec_id").as("id"),
        Similarity.cosine(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(cosOf.length == 10, s"500 ids -> 10 twins, got ${cosOf.length}")
    val targets = Seq(0.99, 0.95, 0.9, 0.8)
    for ((id, c) <- cosOf) {
      val want = targets(((id / 50) % 4).toInt)
      assert(math.abs(c - want) < 1e-3, s"twin $id: cos $c, want $want")
    }
  }

  test("intra-cluster cosines are high, cross-cluster near zero") {
    val withCl = planted
      .filter(pmod(col("vec_id"), lit(50)) =!= 1) // twins follow their source
      .withColumn("cl", pmod(xxhash64(col("vec_id")), lit(64L)).cast("int"))
      .select(col("vec_id"), col("cl"), col("embedding").cast("array<double>").as("v"))
    val pairs = withCl.as("a").join(withCl.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select((col("a.cl") === col("b.cl")).as("same"),
        Similarity.cosine(col("a.v"), col("b.v")).as("c"))
      .groupBy("same").agg(avg("c").as("mean"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(pairs(true) > 0.5, s"intra-cluster mean ${pairs(true)} must be clustered")
    assert(math.abs(pairs(false)) < 0.1, s"cross-cluster mean ${pairs(false)} must be ~0")
  }

  test("powerLawGraph: deterministic, distinct, loop-free, Zipf-headed in-degree") {
    val g = GenData.powerLawGraph(spark, nNodes = 2000, avgOutDeg = 4, skew = 2.0)
      .cache()
    val rows = g.collect().map(r => (r.getLong(0), r.getLong(1)))
    // hash-deterministic: a second build is the identical edge set
    val again = GenData.powerLawGraph(spark, nNodes = 2000, avgOutDeg = 4, skew = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet == again.toSet && rows.length == again.length)
    assert(rows.distinct.length == rows.length, "edges must be distinct")
    assert(rows.forall { case (s, d) => s != d }, "no self-loops")
    assert(rows.forall { case (s, d) =>
      s >= 0 && s < 2000 && d >= 0 && d < 2000 }, "ids in range")
    // every node is a source (no dangling tail by construction)...
    assert(rows.map(_._1).distinct.length == 2000)
    // ...and the in-degree head is Zipf-heavy: the hub (node 0 region)
    // absorbs a large multiple of the mean in-degree
    val inDeg = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val mean = rows.length.toDouble / 2000
    assert(inDeg.getOrElse(0L, 0) > 10 * mean,
      s"hub in-degree ${inDeg.getOrElse(0L, 0)} vs mean $mean")
    g.unpersist()
  }
}
