package graft.tools

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing harness (not part of the library). */
object DebugSf1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ev = Tables.events(spark, sfDir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => ev.select(col("event_id"))),
      "scan_props" -> (() => ev.select(col("event_id"), col("props"))),
      "one_json" -> (() => ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k"))),
      "p1_full" -> (() => ev.select(col("event_id"),
        col("event_type").as("logtype"),
        col("user_id").cast("string").as("userid"),
        get_json_object(col("props"), "$.k").as("k"))),
      "json_tuple" -> (() => ev.select(col("event_id"),
        json_tuple(col("props"), "k", "missing")).toDF("event_id", "k", "m")),
      "f8_full" -> (() => {
        val k = get_json_object(col("props"), "$.k")
        val parts =
          when(pmod(col("user_id"), lit(7)) === 0, lit(null).cast("array<string>"))
            .when(pmod(col("user_id"), lit(7)) === 1, array().cast("array<string>"))
            .otherwise(split(concat(k, lit("-"), col("event_type"), lit("-"), k), "-"))
        ev.select(col("event_id"), parts.as("parts"))
          .select(col("event_id"), explode_outer(col("parts")).as("part"))
      }),
      "f8_precomputed_k" -> (() => {
        val withK = ev.select(col("event_id"), col("user_id"), col("event_type"),
          get_json_object(col("props"), "$.k").as("k"))
        val parts =
          when(pmod(col("user_id"), lit(7)) === 0, lit(null).cast("array<string>"))
            .when(pmod(col("user_id"), lit(7)) === 1, array().cast("array<string>"))
            .otherwise(split(concat(col("k"), lit("-"), col("event_type"), lit("-"), col("k")), "-"))
        withK.select(col("event_id"), parts.as("parts"))
          .select(col("event_id"), explode_outer(col("parts")).as("part"))
      })
    )
    for ((label, mk) <- variants; i <- 1 to 2) {
      System.gc()
      val t0 = System.nanoTime()
      val n = mk().queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-18s run$i $dt%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
