package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sketch-based aggregation sanity: HLL distinct counts land within the
  * documented error bound of the exact answer. (No DuckDB oracle — HLL
  * implementations differ across engines by design.) */
class ApproxSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("hll sketches are mergeable: per-batch sketches union to the whole-corpus answer") {
    // the 100 TB pattern approx_count_distinct can't do: each ingest
    // batch persists a BINARY Datasketches-HLL column; later unions
    // answer corpus-wide distinct counts with NO rescan of the batches.
    // Same lgK ⇒ merged state ≡ single-pass state ⇒ identical estimate.
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val li = Tables.lineitem(spark, sfDir)
    val (a, b) = (li.filter(col("l_orderkey") % 2 === 0), li.filter(col("l_orderkey") % 2 =!= 0))
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    a.agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk")).write.parquet(s"$dir/day1")
    b.agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk")).write.parquet(s"$dir/day2")
    val merged = spark.read.parquet(s"$dir/*")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    val direct = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(14))))
      .collect().head.getLong(0)
    val exact = li.agg(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(merged == direct, s"union-of-sketches $merged != single-pass $direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"$merged vs exact $exact")
  }

  test("count-min sketches are mergeable: per-batch sketches answer corpus-wide frequencies") {
    // the frequency twin of the HLL lifecycle: each ingest batch folds
    // its token stream into a tiny CMS; mergeInPlace unions the batch
    // sketches into a corpus sketch with NO rescan, and estimates over
    // the union obey the same never-underestimate contract the
    // heavy-hitters prefilter relies on (Corpus.heavyHitterTokens).
    import graft.dedup.Dedup
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .withColumn("h", Dedup.md5Hash60(col("tok")))
    val (a, b) = (toks.filter(col("h") % 2 === 0), toks.filter(col("h") % 2 =!= 0))
    val skA = a.stat.countMinSketch("h", 1e-3, 0.99, 42)
    val skB = b.stat.countMinSketch("h", 1e-3, 0.99, 42)
    skA.mergeInPlace(skB)
    val truth = toks.groupBy("h").count().orderBy(desc("count")).limit(20)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    truth.foreach { case (h, n) =>
      val est = skA.estimateCount(java.lang.Long.valueOf(h))
      assert(est >= n, s"merged CMS underestimated $h: $est < $n")
      assert(est <= n + (1e-3 * skA.totalCount()).toLong + 1,
        s"merged CMS estimate for $h way over: $est vs $n")
    }
  }

  test("approx percentiles bracket the exact median") {
    val li = Tables.lineitem(spark, sfDir)
    val Array(p25, p50, p75) = li
      .select(percentile_approx(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)))
      .collect().head.getSeq[Double](0).toArray
    assert(p25 <= p50 && p50 <= p75)
    assert(p50 >= 1.0 && p50 <= 50.0) // l_quantity domain
  }
}
