package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Sink round-trips: parquet/CSV (S4/S5) and a REAL JDBC round-trip
  * (S2/S3) against embedded Derby — same code path as the reference's
  * MySQL endpoints, only the url/driver options differ. */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("jdbc sink + source round-trip (S2/S3) against embedded Derby") {
    val cfg = JdbcConfig(
      url = "jdbc:derby:memory:graftio;create=true",
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      user = "", password = "", table = "ETL_RESULT")
    val df = Seq(("u1", "p1", "cat"), ("u2", "p2", "cat")).toDF("USER_ID", "PRODUCT_CODE", "CAT1")
    Sinks.jdbcAppend(df, cfg)  // append creates the table on first write
    Sinks.jdbcAppend(df, cfg)  // reference semantics: append, not upsert
    val back = Sources.jdbc(spark, cfg)
    assert(back.columns.toSeq == Seq("USER_ID", "PRODUCT_CODE", "CAT1"))
    assert(back.count() == 4)
    assert(rowSet(back.select("USER_ID").distinct()) == Set("u1", "u2"))
  }

  test("jdbcPartitioned reads through multiple partitions with identical results") {
    val cfg = JdbcConfig(
      url = "jdbc:derby:memory:graftiopart;create=true",
      driver = "org.apache.derby.jdbc.EmbeddedDriver",
      user = "", password = "", table = "BIG_TABLE")
    val df = (1L to 97L).map(i => (i, s"row$i")).toDF("ID", "PAYLOAD")
    Sinks.jdbcAppend(df, cfg)
    val back = Sources.jdbcPartitioned(spark, cfg, partitionColumn = "ID",
      lowerBound = 1L, upperBound = 98L, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4, "stride per partition")
    assert(back.count() == 97)
    // out-of-bounds rows still load (into the edge strides)
    val back2 = Sources.jdbcPartitioned(spark, cfg, partitionColumn = "ID",
      lowerBound = 40L, upperBound = 60L, numPartitions = 3)
    assert(back2.count() == 97, "bounds stride the read; they do not filter")
  }

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

  test("jsonl sink: one JSON object per line, round-trips; partitioned variant shards by column") {
    import spark.implicits._
    val df = Seq((1L, "train", "alpha"), (2L, "val", "beta"), (3L, "train", "gamma"))
      .toDF("doc_id", "split", "text")
    val dir = Files.createTempDirectory("jsonl").toString + "/out"
    Sinks.jsonl(df, dir)
    // each line parses standalone (the property JSONL consumers rely on)
    val lines = Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.length == 3 && lines.forall(l => l.startsWith("{") && l.endsWith("}")), lines.mkString("\n"))
    assert(spark.read.json(dir).count() == 3)

    val pdir = Files.createTempDirectory("jsonlp").toString + "/out"
    Sinks.jsonlPartitioned(df, pdir, Seq("split"))
    assert(new java.io.File(pdir, "split=train").isDirectory, "shard dirs by split value")
    val back = spark.read.json(pdir)
    assert(back.count() == 3 && back.columns.toSet == Set("doc_id", "split", "text"))
  }

  test("orc sink + source round-trip; filter pushed to the orc scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 100L).map(i => (i, s"doc$i", i % 7)).toDF("doc_id", "text", "grp")
    val dir = Files.createTempDirectory("orcio").toString + "/t"
    Sinks.orcAppend(df, dir)
    Sinks.orcAppend(df.filter(col("doc_id") <= 10), dir) // append accumulates
    val back = Sources.orc(spark, dir)
    assert(back.count() == 110)
    assert(back.schema("doc_id").dataType.typeName == "long")
    // predicate reaches the ORC scan (same contract as parquet pushdown)
    val p = back.filter(col("doc_id") === 5L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(doc_id,5"), p)
    assert(back.filter(col("doc_id") === 5L).count() == 2)
  }
}
