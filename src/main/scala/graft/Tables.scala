package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every loader is a plain `spark.read.parquet` — schema comes from the
  * parquet footer, filters/column pruning push down automatically
  * (Catalyst `PushedFilters` / `ReadSchema`). At 100 TB the same call
  * reads a partitioned directory tree; nothing here assumes a single
  * file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects at
    * scan time. The session must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (done once in every
    * entry-point builder: Bench, Verify, Explain, SessionFactory, test
    * session) so the scan reads nanos as raw longs; this loader then
    * surfaces a proper µs TimestampType column. Integer DIV avoids the
    * double round-trip (ns epoch ≈ 1.7e18 > 2^53). The loader itself is
    * side-effect-free — mutating shared-session conf inside a reader
    * would race concurrent queries on the same session. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One catalog entry: a Spark query + (optionally) the equivalent ANSI
  * SQL for the driver's DuckDB oracle. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
