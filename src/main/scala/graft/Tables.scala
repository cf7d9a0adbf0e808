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
  /** events.parquet's `ts` physical type has varied across driver data
    * generations — TIMESTAMP(NANOS) (readable only as a raw long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which every
    * entry-point builder still sets) vs TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ since the file carries no UTC flag). Dispatch on the
    * SCANNED type so the same build runs against either generation, and
    * always surface the session-TZ TimestampType every downstream
    * operator (windows, session_window, streaming) expects. All
    * sessions here run UTC, so the NTZ cast is value-preserving. Integer
    * DIV on the nanos path avoids the double round-trip (ns epoch ≈
    * 1.7e18 > 2^53). The loader is side-effect-free — mutating
    * shared-session conf inside a reader would race concurrent queries
    * on the same session. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
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
