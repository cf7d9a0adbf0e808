package graft.streaming

import graft.SparkSpec
import graft.etl.Scd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DimStream.maintainScd2: cross-batch SCD2 state matches a direct batch
  * replay of Scd.scd2Merge (stream == batch), intra-batch CDC updates
  * compact to the last sequence number, and history rows land under
  * their batch's partition. */
class DimStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("bal", DoubleType),
    StructField("seg", StringType), StructField("seq", LongType)))

  private def ts(batchId: Long) =
    lit(f"2024-01-${batchId + 1}%02d 00:00:00").cast("timestamp")

  private val b1 = Seq(
    (1L, 10.0, "A", 1L), (1L, 11.0, "A", 2L), // intra-batch: last wins
    (2L, 20.0, "B", 1L))
  private val b2 = Seq(
    (1L, 12.0, "A", 3L), // change
    (2L, 20.0, "B", 4L), // no-op
    (3L, 30.0, "C", 5L)) // new key

  private def compact(rows: Seq[(Long, Double, String, Long)]): DataFrame =
    rows.toDF("k", "bal", "seg", "seq")
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("bal"), col("seg"))).as("l"))
      .select(col("k"), col("l.bal").as("bal"), col("l.seg").as("seg"))

  test("streamed SCD2 slice and history equal the direct batch replay") {
    val root = java.nio.file.Files.createTempDirectory("dim-stream").toString
    val in = s"$root/in"; val slice = s"$root/slice"; val hist = s"$root/hist"
    b1.toDF("k", "bal", "seg", "seq").write.parquet(s"$in/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$in/*")
    val q = DimStream.maintainScd2(stream, slice, hist, s"$root/ckpt",
      "k", Seq("bal", "seg"), "seq", ts)
    try {
      q.processAllAvailable()
      b2.toDF("k", "bal", "seg", "seq").write.mode("append").parquet(s"$in/b2")
      q.processAllAvailable()
    } finally q.stop()

    // direct replay: empty dim -> merge compacted b1 at ts(0) -> merge
    // compacted b2 at ts(1)
    val dim0 = compact(b1).limit(0)
      .withColumn("valid_from", ts(0))
      .withColumn("valid_to", when(lit(false), ts(0)))
      .withColumn("is_current", lit(true))
    val m1 = Scd.scd2Merge(dim0, compact(b1), "k", Seq("bal", "seg"), ts(0))
    val m2 = Scd.scd2Merge(m1.filter(col("is_current")), compact(b2),
      "k", Seq("bal", "seg"), ts(1))

    assert(rowSet(DimStream.readCurrentSlice(spark, slice).get) ==
      rowSet(m2.filter(col("is_current"))))
    val wantHist = m1.filter(!col("is_current"))
      .unionByName(m2.filter(!col("is_current")))
    assert(rowSet(spark.read.parquet(hist).drop("_batch_id")) ==
      rowSet(wantHist))
  }

  test("intra-batch compaction keeps only the last version; history partitions by batch") {
    val root = java.nio.file.Files.createTempDirectory("dim-stream2").toString
    val in = s"$root/in"; val slice = s"$root/slice"; val hist = s"$root/hist"
    b1.toDF("k", "bal", "seg", "seq").write.parquet(s"$in/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$in/*")
    val q = DimStream.maintainScd2(stream, slice, hist, s"$root/ckpt",
      "k", Seq("bal", "seg"), "seq", ts)
    try {
      q.processAllAvailable()
      b2.toDF("k", "bal", "seg", "seq").write.mode("append").parquet(s"$in/b2")
      q.processAllAvailable()
    } finally q.stop()

    val cur = DimStream.readCurrentSlice(spark, slice).get
      .select("k", "bal").as[(Long, Double)].collect().toMap
    assert(cur == Map(1L -> 12.0, 2L -> 20.0, 3L -> 30.0))
    // k=1's bal=10.0 intermediate version never became a history row
    val histBals = spark.read.parquet(hist)
      .select("bal").as[Double].collect().toSet
    assert(histBals == Set(11.0))
    // and the closed row carries batch 1's partition
    val parts = spark.read.parquet(hist).select("_batch_id")
      .as[Long].collect().toSet
    assert(parts == Set(1L))
  }

  /** Expected end state after b1 then b2: direct double replay. */
  private def expected() = {
    val dim0 = compact(b1).limit(0)
      .withColumn("valid_from", ts(0))
      .withColumn("valid_to", when(lit(false), ts(0)))
      .withColumn("is_current", lit(true))
    val m1 = Scd.scd2Merge(dim0, compact(b1), "k", Seq("bal", "seg"), ts(0))
    val m2 = Scd.scd2Merge(m1.filter(col("is_current")), compact(b2),
      "k", Seq("bal", "seg"), ts(1))
    (m2.filter(col("is_current")),
      m1.filter(!col("is_current")).unionByName(m2.filter(!col("is_current"))))
  }

  test("crash between version write and pointer swap: slice survives, restart replays the batch") {
    val root = java.nio.file.Files.createTempDirectory("dim-crash1").toString
    val in = s"$root/in"; val slice = s"$root/slice"; val hist = s"$root/hist"
    b1.toDF("k", "bal", "seg", "seq").write.parquet(s"$in/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$in/*")
    val q = DimStream.maintainScd2(stream, slice, hist, s"$root/ckpt",
      "k", Seq("bal", "seg"), "seq", ts)
    try q.processAllAvailable() finally q.stop()
    assert(DimStream.currentVersion(slice) == Some("v0"))

    // Simulate batch 1 dying AFTER the next version dir is fully written
    // but BEFORE the pointer swap (the old delete-then-move code's fatal
    // window): the checkpoint never commits, so a restart replays it.
    val boom = intercept[RuntimeException] {
      DimStream.applyBatch(b2.toDF("k", "bal", "seg", "seq"), 1L,
        slice, hist, "k", Seq("bal", "seg"), "seq", ts,
        failpoint = at => if (at == "after-version-write") throw new RuntimeException("crash"))
    }
    assert(boom.getMessage == "crash")
    // The dim is NOT destroyed: pointer still names the complete old slice.
    assert(DimStream.currentVersion(slice) == Some("v0"))
    val surviving = DimStream.readCurrentSlice(spark, slice).get
    assert(surviving.count() == 2) // k=1, k=2 from batch 0 all present

    // Restart the stream; batch 1 replays in full against the intact slice.
    b2.toDF("k", "bal", "seg", "seq").write.mode("append").parquet(s"$in/b2")
    val q2 = DimStream.maintainScd2(
      spark.readStream.schema(schema).parquet(s"$in/*"),
      slice, hist, s"$root/ckpt", "k", Seq("bal", "seg"), "seq", ts)
    try q2.processAllAvailable() finally q2.stop()

    val (wantCur, wantHist) = expected()
    assert(rowSet(DimStream.readCurrentSlice(spark, slice).get) == rowSet(wantCur))
    // No spurious reopen rows and no duplicated closed rows: the crashed
    // attempt's _batch_id=1 history partition was dynamically overwritten.
    assert(rowSet(spark.read.parquet(hist).drop("_batch_id")) == rowSet(wantHist))
    // Orphan v1 from the crashed attempt was rebuilt/swept, not leaked.
    assert(DimStream.currentVersion(slice) == Some("v1"))
  }

  test("crash after pointer swap: at-least-once replay of the committed batch is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("dim-crash2").toString
    val in = s"$root/in"; val slice = s"$root/slice"; val hist = s"$root/hist"
    b1.toDF("k", "bal", "seg", "seq").write.parquet(s"$in/b1")
    val stream = spark.readStream.schema(schema).parquet(s"$in/*")
    val q = DimStream.maintainScd2(stream, slice, hist, s"$root/ckpt",
      "k", Seq("bal", "seg"), "seq", ts)
    try {
      q.processAllAvailable()
      b2.toDF("k", "bal", "seg", "seq").write.mode("append").parquet(s"$in/b2")
      q.processAllAvailable()
    } finally q.stop()
    val sliceBefore = rowSet(DimStream.readCurrentSlice(spark, slice).get)
    val histBefore = rowSet(spark.read.parquet(hist))

    // A crash between the pointer swap and the checkpoint commit makes
    // the engine replay batch 1 against the ALREADY-merged slice.
    DimStream.applyBatch(b2.toDF("k", "bal", "seg", "seq"), 1L,
      slice, hist, "k", Seq("bal", "seg"), "seq", ts)

    assert(rowSet(DimStream.readCurrentSlice(spark, slice).get) == sliceBefore)
    assert(rowSet(spark.read.parquet(hist)) == histBefore)
  }
}
