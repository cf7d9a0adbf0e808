package graft.etl

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, Row}

/** The reference's 4-row golden input (jobs/etl_job.py:502-515,
  * FIXTURES.md §1) rebuilt in-memory, plus a synthetic category dim. */
object Fixtures {
  import Schemas.logEvent

  /** Columns in schema order: custid, custom, info, logtype, maid,
    * timestamp, userid. */
  def logRow(maid: String, siteseq: String, userid: String, custid: String,
             ts: String, logtype: String, custom: String): Row =
    Row(custid, custom, Row(siteseq), logtype, maid, ts, userid)

  val goldenRows: Seq[Row] = Seq(
    logRow("test_maid1", "4550", "uid-1", "cid-1", "2019-06-01T01:43:09.000Z",
      "purchase", """{"goodsCode": ["4550-pc1"], "goodsName": ["4550-pn1"]}"""),
    logRow("test_maid2", "155138", "uid-2", "cid-2", "2019-06-01T01:43:09.000Z",
      "purchase", """{"goodsCode": ["155138-pc1"], "goodsName": ["155138-pn1"]}"""),
    logRow("test_maid3", "-48", "uid-3", "cid-3", "2019-06-01T01:43:09.000Z",
      "purchase", """{"goodsCode": ["-48-pc1", "-48-pc2"], "goodsName":["-48-pn1", "-48-pn2"]}"""),
    logRow("test_maid4", "155138", "uid-4", "cid-4", "2019-06-01T01:43:09.000Z",
      "purchase", """{"goodsCode": ["155138-pc1"], "goodsName": ["155138-pn1"]}"""))

  def goldenLogs: DataFrame = {
    val s = TestSpark.spark
    s.createDataFrame(s.sparkContext.parallelize(goldenRows), logEvent)
  }

  def logs(rows: Seq[Row]): DataFrame = {
    val s = TestSpark.spark
    s.createDataFrame(s.sparkContext.parallelize(rows), logEvent)
  }

  /** Types used by the reference's fixture generator
    * (jobs/etl_job.py:527-532). */
  val types: TransformTypes = TransformTypes(
    default = Seq("154992"), type1 = Seq("-48"),
    type2 = Seq("155138"), type3 = Seq("4550"))

  def categories(rows: Seq[Row]): DataFrame = {
    val s = TestSpark.spark
    s.createDataFrame(s.sparkContext.parallelize(rows), Schemas.category)
  }

  def catRow(shoppingId: String, itemCode: String, tag: String): Row =
    Row(shoppingId, itemCode, s"intg-$tag", s"name-$tag",
      s"c1-$tag", s"c2-$tag", s"c3-$tag", s"c4-$tag",
      s"ic1-$tag", s"ic2-$tag", s"ic3-$tag", s"ic4-$tag")
}
