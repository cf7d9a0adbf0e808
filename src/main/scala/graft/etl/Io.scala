package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S1-S8: sources and sinks (jobs/etl_job.py:78-122,426-452).
  *
  * JDBC parity note: no MySQL exists in this environment; the JDBC paths
  * build the exact option set the reference uses and round-trip against
  * embedded Derby in IoSpec (SURVEY.md §7.4 risk 3) — only url/driver
  * options differ from the MySQL endpoints.
  */
object Sources {

  /** S1: parquet scan of the (possibly partitioned/globbed) log path.
    * The reference passes a monthly glob ending in `yyyymm=201906`
    * (configs/etl_config.json:28); for a properly partitioned layout
    * prefer reading the root and filtering on the partition column so
    * Catalyst prunes partitions instead of the shell glob. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S1 with the declared schema (fails fast on drift; SURVEY.md §1.4). */
  def logs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.logEvent).parquet(path)

  /** ORC source — the other columnar lake format (Hive-ecosystem
    * interchange). Same pushdown/pruning story as parquet: Spark's
    * native ORC reader serves PushedFilters and ReadSchema from file/
    * stripe statistics. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S2: JDBC scan (jobs/etl_job.py:92-105). Single-partition read — the
    * category dim is small; use [[jdbcPartitioned]] for big tables. */
  def jdbc(spark: SparkSession, c: JdbcConfig): DataFrame =
    spark.read.format("jdbc")
      .option("url", c.url)
      .option("driver", c.driver)
      .option("dbtable", c.table)
      .option("user", c.user)
      .option("password", c.password)
      .load()

  /** S2 at scale: partitioned JDBC scan. `numPartitions` concurrent
    * connections each pull one stride of `partitionColumn` between the
    * bounds (rows outside the bounds still load, into the first/last
    * stride — Spark's documented semantics). Without this a big table
    * arrives through ONE connection on one task; with it the read
    * parallelizes and downstream stages start from a sane partition
    * count. Bounds are caller-supplied (a SELECT min/max pre-query, or
    * known domain) — Spark does not probe them itself. */
  def jdbcPartitioned(spark: SparkSession, c: JdbcConfig,
                      partitionColumn: String,
                      lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", c.url)
      .option("driver", c.driver)
      .option("dbtable", c.table)
      .option("user", c.user)
      .option("password", c.password)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}

object Sinks {

  /** S3: JDBC append (jobs/etl_job.py:108-122). Idempotency is the
    * caller's problem — reference semantics, documented. */
  def jdbcAppend(df: DataFrame, c: JdbcConfig): Unit =
    df.write.format("jdbc")
      .option("url", c.url)
      .option("driver", c.driver)
      .option("dbtable", c.table)
      .option("user", c.user)
      .option("password", c.password)
      .mode(SaveMode.Append)
      .save()

  /** S4: parquet append (jobs/etl_job.py:441-452). Deliberately NOT
    * coalesced — parallel writers, one file per task. */
  def parquetAppend(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** S4 at scale: partitioned parquet layout (e.g. by month, the
    * reference's yyyymm= convention done properly) — readers filtering
    * on the partition column scan only matching directories (partition
    * pruning), which is what makes monthly re-runs over 100 TB cheap. */
  def parquetPartitionedAppend(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode(SaveMode.Append).parquet(path)

  /** S5: single-file UTF-8 CSV with header (jobs/etl_job.py:426-438).
    * coalesce(1) serializes the final stage — only for small exports. */
  def csvSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .option("encoding", "utf-8")
      .option("header", "true")
      .mode(SaveMode.Overwrite)
      .csv(path)

  /** JSONL export — the lingua franca of training-data interchange
    * (one JSON object per line, gzip-friendly, streamable). Parallel
    * writers, one file per task; pair with repartition(n) upstream to
    * control shard count/size. maxRecordsPerFile bounds shard size so
    * a skewed partition can't produce a monster file. */
  def jsonl(df: DataFrame, path: String, maxRecordsPerFile: Long = 0L): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .json(path)

  /** JSONL sharded by a column (e.g. split=train/val/test or language)
    * — each shard value becomes a directory, so downstream loaders pick
    * shards by path without reading footers. */
  def jsonlPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode(SaveMode.Overwrite).json(path)

  /** ORC append sink — parallel writers, one file per task, same
    * contract as [[parquetAppend]]. */
  def orcAppend(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).orc(path)
}
