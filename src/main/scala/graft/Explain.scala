package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of each catalog
  * query (or the ones named in args) so pushdown/broadcast/shuffle
  * choices can be reviewed. Usage: runMain graft.Explain [names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    SparkEntry.catalog.filter(q => wanted(q.name)).foreach { q =>
      println(s"\n================ ${q.name} ================")
      q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
