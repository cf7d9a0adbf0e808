package graft.etl

import org.apache.spark.sql.{Row, SparkSession}

/** Runs the full extract → transform → load job end-to-end on the
  * reference's 4-row golden fixture plus a synthetic category dim:
  * writes input parquet to a temp dir, runs EtlJob with a file sink,
  * reads the sink back and prints it. Usage: runMain graft.etl.EtlDemo
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SessionFactory.build("etl-demo", Some("local[4]"),
      shufflePartitions = 4, extra = Map("spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("etl-demo").toString

    // golden input (jobs/etl_job.py:502-515) + one login row
    def logRow(maid: String, siteseq: String, userid: String, custid: String,
               ts: String, logtype: String, custom: String): Row =
      Row(custid, custom, Row(siteseq), logtype, maid, ts, userid)
    val rows = Seq(
      logRow("test_maid1", "4550", "uid-1", "cid-1", "2019-06-01T01:43:09.000Z",
        "purchase", """{"goodsCode": ["4550-pc1"], "goodsName": ["4550-pn1"]}"""),
      logRow("test_maid3", "-48", "uid-3", "cid-3", "2019-06-01T01:43:09.000Z",
        "purchase", """{"goodsCode": ["-48-pc1", "-48-pc2"], "goodsName":["-48-pn1", "-48-pn2"]}"""),
      logRow("test_maid5", "-48", null, "cid-5", "2019-06-01T01:43:09Z",
        "login", """{}"""))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.logEvent)
      .write.parquet(s"$dir/logs")

    val cats = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("-48", "-48-pc1", "i1", "n1", "c1", "c2", "c3", "c4",
          "ic1", "ic2", "ic3", "ic4"))),
      Schemas.category)
    cats.createOrReplaceTempView("demo_categories")

    // config in the reference's JSON shape, through the real parser
    val cfg = ConfigLoader.fromString(s"""
      {"transform": {"default": [154992], "type1": [-48],
                     "type2": [155138], "type3": [4550]},
       "mysql": {"insert": false},
       "file": {"write": true,
                "load": {"path": "$dir/logs"},
                "save": {"path": "$dir/out"}}}""")

    // run with the in-memory dim instead of JDBC (no MySQL here)
    val job = new EtlJob(spark, cfg) {
      override def extract(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
        (Sources.logs(spark, cfg.loadPath), cats)
    }
    job.run()

    val out = spark.read.parquet(s"$dir/out")
    out.orderBy("USER_ID").show(20, truncate = false)
    println(s"ETL_DEMO_ROWS=${out.count()}")
    spark.stop()
  }
}
