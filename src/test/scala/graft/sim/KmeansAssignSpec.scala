package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{CentroidMatrix, KmeansNearestLists, VectorExpressions}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The native KmeansNearestLists kernel must be bit-identical to the
  * literal-inlined array_sort form it replaced (which is what the
  * DuckDB oracles replay), must work at realistic list counts where the
  * literal form's generated method crossed the JIT ceiling, and must
  * ship centroids by reference/broadcast — never as plan literals. */
class KmeansAssignSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random vectors (splitmix-ish, no RNG state). */
  private def vec(seed: Long, d: Int = dim): Seq[Double] =
    Seq.tabulate(d) { i =>
      var z = seed * 1000003L + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      ((z >>> 11) * 1.1102230246251565e-16) - 0.5
    }

  private def embDf(n: Int, d: Int = dim) =
    (0L until n.toLong).map(i => (i, vec(i, d))).toDF("vec_id", "v")

  private def cents(k: Int, d: Int = dim): Seq[(Int, Seq[Double])] =
    (0 until k).map(j => (j, vec(j * 7919L + 3L, d)))

  test("kernel assignment == literal array_sort form (L2), every row") {
    val df = embDf(200)
    val cs = cents(8)
    val out = df.select(col("vec_id"),
      Similarity.kmeansAssign(col("v"), cs).as("native"),
      Similarity.kmeansAssignLiteral(col("v"), cs).as("literal"))
      .filter(col("native") =!= col("literal"))
    assert(out.count() == 0, out.collect().take(5).mkString("\n"))
  }

  test("kernel nearest lists == literal slice form (cosine), nprobe 1..3") {
    val df = embDf(200)
    val cs = cents(8)
    for (nprobe <- 1 to 3) {
      val out = df.select(
        Similarity.nearestListsByCosine(col("v"), cs, nprobe).as("native"),
        Similarity.nearestListsByCosineLiteral(col("v"), cs, nprobe).as("literal"))
        .filter(col("native") =!= col("literal"))
      assert(out.count() == 0,
        s"nprobe=$nprobe: " + out.collect().take(5).mkString("\n"))
    }
  }

  test("broadcast transport == in-plan transport, value for value") {
    val df = embDf(100)
    val m = {
      val cs = cents(6)
      CentroidMatrix(cs.map(_._1).toArray, cs.flatMap(_._2).toArray, dim)
    }
    val bc = spark.sparkContext.broadcast(m)
    try {
      val out = df.select(
        VectorExpressions.kmeansNearestLists(col("v"), Left(m), byCosine = true, 2).as("local"),
        VectorExpressions.kmeansNearestLists(col("v"), Right(bc), byCosine = true, 2).as("bcast"))
        .filter(col("local") =!= col("bcast"))
      assert(out.count() == 0, out.collect().take(5).mkString("\n"))
    } finally bc.destroy()
  }

  test("nLists=256, dim=64: kernel assigns correctly with a tiny generated method") {
    // the regime where the literal form's generated code (256 structs ×
    // 64-literal dot chains) crossed HotSpot's 8 KB JIT ceiling — the
    // kernel's generated code is one reference call regardless of k
    val d = 64
    val cs = cents(256, d)
    val m = CentroidMatrix(cs.map(_._1).toArray, cs.flatMap(_._2).toArray, d)
    val e = KmeansNearestLists(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      Left(m), byCosine = false, nprobe = 1)
    assert(!e.isInstanceOf[CodegenFallback])
    val code = e.genCode(new CodegenContext).code.toString
    assert(code.contains("compute") && code.length < 2048,
      s"generated code must be a single kernel call (got ${code.length} chars)")

    // correctness vs a driver-side replay of the exact same arithmetic
    val rows = embDf(300, d).select(col("vec_id"),
      Similarity.kmeansAssign(col("v"), cs).as("list")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
      s
    }
    for (i <- 0L until 300L) {
      val v = vec(i, d)
      val expected = cs.map { case (j, c) =>
        ((dot(v, v) - 2.0 * dot(v, c)) + dot(c, c), j)
      }.minBy(identity)._2
      assert(rows(i) == expected, s"vec $i: got ${rows(i)}, want $expected")
    }
  }

  test("null vector falls back to the ascending-list prefix (literal-form behavior)") {
    val cs = cents(4)
    val df = Seq((0L, Option.empty[Seq[Double]]), (1L, Some(vec(1L))))
      .toDF("vec_id", "v")
    val out = df.select(col("vec_id"),
      Similarity.kmeansAssign(col("v"), cs).as("a"),
      Similarity.nearestListsByCosine(col("v"), cs, 2).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    assert(out(0L) == ((0, Seq(0, 1))), s"null vec: ${out(0L)}")
    // and the literal form agrees on the null row
    val lit0 = df.filter(col("vec_id") === 0L)
      .select(Similarity.kmeansAssignLiteral(col("v"), cs)).collect().head.getInt(0)
    assert(lit0 == 0)
  }

  test("probe-count edge cases: nprobe > k returns all lists; ragged centroids rejected") {
    val cs = cents(3)
    val df = embDf(5)
    val all = df.select(Similarity.nearestListsByCosine(col("v"), cs, 10).as("n"))
      .collect().map(_.getSeq[Int](0))
    assert(all.forall(_.sorted == Seq(0, 1, 2)))
    intercept[IllegalArgumentException] {
      Similarity.kmeansAssign(col("v"), Seq((0, Seq(1.0, 2.0)), (1, Seq(1.0))))
    }
  }
}
