package graft.sketch

import graft.SparkSpec

/** Laws of the q-digest quantile sketch: exact-count merge, canonical
  * deterministic compression, the bits·n/k rank-error bound against
  * exact ranks, and the ≤3k size bound — the same mergeable-lifecycle
  * contract ApproxSpec pins for the HLL and count-min sketches.
  */
class QDigestSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 14 // universe [0, 16384)
  private val k = 64

  // deterministic non-uniform multiset: squares mod 16384 plus a heavy
  // spike at 1000 — exercises both spread mass and a hot leaf
  private def values: Seq[Long] =
    (0L until 20000L).map(i => (i * i) % 16384L) ++ Seq.fill(5000)(1000L)

  private def exactRank(v: Long): Long = values.count(_ <= v)

  test("build: rank error within bits*n/k at every decile; size bounded; deterministic re-run") {
    val df = values.toDF("v").repartition(7)
    val sk = QDigest.build(df, "v", bits, k)
    assert(sk.n == values.size)
    assert(sk.size <= 3 * k, s"size ${sk.size} > 3k")
    val bound = bits.toLong * (sk.n / k)
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(q)
      val target = math.ceil(q * sk.n).toLong
      // the true rank of the reported value must be within the bound
      // of the requested rank on at least one side (value intervals)
      val lo = exactRank(est - 1)
      val hi = exactRank(est)
      assert(lo - bound <= target && target <= hi + bound,
        s"q=$q est=$est rank∈[$lo,$hi] target=$target bound=$bound")
    }
    // determinism: identical bytes on a re-build of the same data
    val sk2 = QDigest.build(df, "v", bits, k)
    assert(sk2.nodes == sk.nodes && sk2.n == sk.n)
  }

  test("merge law: partials summed in any order + one final compress answer like the whole build") {
    val (h1, h2) = values.splitAt(9000)
    val a = QDigest.build(h1.toDF("v").repartition(3), "v", bits, k)
    val b = QDigest.build(h2.toDF("v").repartition(4), "v", bits, k)
    val ab = a.merge(b).compress
    val ba = b.merge(a).compress
    assert(ab.nodes == ba.nodes, "merge must be order-insensitive")
    assert(ab.n == values.size)
    val whole = QDigest.build(values.toDF("v"), "v", bits, k)
    val bound = 2L * bits * (ab.n / k) // partial thresholds + final pass
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val target = math.ceil(q * ab.n).toLong
      val est = ab.quantile(q)
      val lo = exactRank(est - 1); val hi = exactRank(est)
      assert(lo - bound <= target && target <= hi + bound,
        s"merged q=$q est=$est rank∈[$lo,$hi] target=$target")
      // merged and whole agree to within the same bound
      assert(math.abs(ab.rankOf(est) - whole.rankOf(est)) <= bound)
    }
  }

  test("persisted lifecycle: per-day sketches written as parquet union to the in-memory merge exactly") {
    val (d1, d2) = values.splitAt(12000)
    val s1 = QDigest.build(d1.toDF("v"), "v", bits, k)
    val s2 = QDigest.build(d2.toDF("v"), "v", bits, k)
    val dir = java.nio.file.Files.createTempDirectory("qdigest-spec").toString
    QDigest.toDf(spark, s1).write.parquet(s"$dir/day1")
    QDigest.toDf(spark, s2).write.parquet(s"$dir/day2")
    val fromDisk = QDigest.fromDf(spark.read.parquet(s"$dir/day*"))
    val inMem = s1.merge(s2).compress
    assert(fromDisk.nodes == inMem.nodes && fromDisk.n == inMem.n,
      "disk round-trip must be byte-identical to the in-memory merge")
  }

  test("guards: universe violation and incompatible merge fail fast; empty quantile refuses") {
    val e1 = intercept[org.apache.spark.SparkException] {
      QDigest.build(Seq(-1L).toDF("v"), "v", bits, k)
    }
    assert(e1.getMessage != null)
    val e2 = intercept[IllegalArgumentException] {
      QDigest.empty(10, 64).merge(QDigest.empty(12, 64))
    }
    assert(e2.getMessage.contains("incompatible"))
    val e3 = intercept[IllegalArgumentException] {
      QDigest.empty(10, 64).quantile(0.5)
    }
    assert(e3.getMessage.contains("empty"))
  }
}
