package graft.layout

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.VectorExpressions

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit j of dim k at position j*D + k") {
    // hand-computed Morton values for the 2-D unit cases and a mix
    // z(5,6): j=0: 1<<0 | 0<<1 = 1; j=1: 0<<2 | 1<<3 = 8; j=2: 1<<4 | 1<<5 = 48 → 57
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 3L, 15L), (5L, 6L, 57L))
    val df = cases.toDF("x", "y", "want")
      .withColumn("got", Layout.zorderValue(Seq(col("x"), col("y")), 8))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("parity with the expanded shift/mask column form on random data") {
    val df = spark.range(2000).select(
      pmod(xxhash64(col("id")), lit(1 << 16)).as("x"),
      pmod(xxhash64(col("id") + 7), lit(1 << 16)).as("y"))
    val ref = (0 until 16).map(j =>
      shiftleft(shiftright(col("x"), j).bitwiseAND(1), 2 * j).cast("long") +
        shiftleft(shiftright(col("y"), j).bitwiseAND(1), 2 * j + 1).cast("long"))
      .reduce(_ + _)
    val out = df.select(
      Layout.zorderValue(Seq(col("x"), col("y")), 16).as("native"), ref.as("ref"))
    assert(out.filter(col("native") =!= col("ref")).count() == 0L)
  }

  test("masking: an overflowing dimension degrades locality, never corrupts neighbors") {
    val df = Seq((1L + (1L << 30), 1L)).toDF("x", "y") // x overflows 8 bits
    val z = df.select(Layout.zorderValue(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].head()
    assert(z == 3L) // masked x = 1, y = 1
  }

  test("zorder_long registers as a SQL function") {
    VectorExpressions.register(spark)
    val z = spark.sql("SELECT zorder_long(array(5L, 6L), 8) AS z").as[Long].head()
    assert(z == 57L)
  }

  test("z-ordered files have bounded boxes in BOTH dims; linear sort only in its own") {
    // 64×64 uniform grid, 16 files each way. Under z-order every file's
    // (x, y) box is a contiguous curve chunk — both extents bounded;
    // under sort-by-x each file spans the FULL y range, so a predicate
    // on y alone prunes nothing.
    val grid = spark.range(64L * 64L).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64L)).as("y"))
    val zDir = Files.createTempDirectory("zorder").toString + "/t"
    Layout.writeZOrdered(grid, Seq(col("x"), col("y")), 6, zDir, nFiles = 16)
    val linDir = Files.createTempDirectory("linear").toString + "/t"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(linDir)
    def avgYSpan(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max("y") - min("y")).as("span"))
        .select(avg("span")).as[Double].head()
      spans
    }
    val zSpan = avgYSpan(zDir)
    val linSpan = avgYSpan(linDir)
    assert(zSpan <= 40.0, s"z-order y-span $zSpan should be bounded (vs 63 full range)")
    assert(linSpan >= 60.0, s"linear-sort y-span $linSpan should cover ~full range")
    // and z-order still bounds x too (each chunk is a contiguous curve range)
    val zxSpan = spark.read.parquet(zDir)
      .groupBy(input_file_name()).agg((max("x") - min("x")).as("span"))
      .select(avg("span")).as[Double].head()
    assert(zxSpan <= 40.0, s"z-order x-span $zxSpan should be bounded too")
  }
}
