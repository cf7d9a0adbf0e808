package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Sink round-trips (S4/S5) — the JDBC paths (S2/S3) are option-plumbing
  * only since no database exists in this environment. */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("csvSingleFile: single part file, header, round-trips") {
    val dir = Files.createTempDirectory("csv-sink").toString + "/out"
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    Sinks.csvSingleFile(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1) // coalesce(1) → exactly one data file
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq == Seq("k", "v"))
    assert(rowSet(back) == Set("a|1", "b|2"))
  }

  test("parquetAppend: append mode accumulates rows") {
    val dir = Files.createTempDirectory("pq-sink").toString + "/out"
    val df = Seq(("a", 1)).toDF("k", "v")
    Sinks.parquetAppend(df, dir)
    Sinks.parquetAppend(df, dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("logs source applies the declared schema") {
    val dir = Files.createTempDirectory("logs-src").toString + "/logs"
    Fixtures.goldenLogs.write.parquet(dir)
    val back = Sources.logs(spark, dir)
    assert(back.schema == Schemas.logEvent)
    assert(back.count() == 4)
  }
}
