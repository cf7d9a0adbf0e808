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

  test("compact collapses a small-file table, preserves rows, bounds file sizes") {
    val srcDir = Files.createTempDirectory("frag").toString + "/t"
    val df = spark.range(1000).select(col("id"), pmod(col("id"), lit(4)).as("p"))
    df.repartition(50).write.parquet(srcDir) // 50 tiny files
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files(srcDir).size == 50)

    val outDir = Files.createTempDirectory("compacted").toString + "/t"
    Layout.compact(spark.read.parquet(srcDir), targetRecordsPerFile = 300L, outDir,
      sortCols = Seq(col("id")))
    assert(files(outDir).size == 4, files(outDir).map(_.getName).toString) // ceil(1000/300)
    // contents identical
    assert(spark.read.parquet(outDir).select("id").as[Long].collect().sorted.toSeq
      == (0L until 1000L).toSeq)
    // sorted compaction keeps file min/max ranges disjoint (pruning stays tight)
    val ranges = spark.read.parquet(outDir)
      .groupBy(input_file_name().as("f")).agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlapping file ranges: $a $b")
      case _ =>
    }

    // hive-partitioned compaction: partition dirs survive, each compacted
    val partDir = Files.createTempDirectory("compacted-part").toString + "/t"
    Layout.compact(spark.read.parquet(srcDir), targetRecordsPerFile = 300L, partDir,
      partitionCols = Seq("p"))
    val partDirs = new java.io.File(partDir).listFiles().filter(_.getName.startsWith("p="))
    assert(partDirs.map(_.getName).sorted.toSeq == Seq("p=0", "p=1", "p=2", "p=3"))
    assert(spark.read.parquet(partDir).count() == 1000L)
    // no partition dir explodes past a handful of files
    partDirs.foreach(d => assert(files(d.toString).size <= 4, d.toString))
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

  test("bucketed tables join with ZERO exchange (write-once shuffle, co-located reads)") {
    val n = 10000L
    val facts = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("a"))
    val dims = spark.range(n).select(col("id").as("k"), (col("id") * 3).as("b"))
    Layout.writeBucketed(facts, "graft_bkt_facts", "k", 8, sortCols = Seq("k"))
    Layout.writeBucketed(dims, "graft_bkt_dims", "k", 8, sortCols = Seq("k"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join down the sort-merge path so the exchange question
      // is actually asked (a broadcast would dodge it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_facts")
        .join(spark.table("graft_bkt_dims"), "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must not re-shuffle either side:\n" + p)
      assert(joined.count() == n)
      // same join WITHOUT bucketing shuffles both sides — the cost the
      // bucketed layout paid once at write time
      val unbucketed = facts.join(dims, "k")
      unbucketed.collect()
      val up = unbucketed.queryExecution.executedPlan.toString
      assert(up.contains("Exchange hashpartitioning"), up)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }
}
