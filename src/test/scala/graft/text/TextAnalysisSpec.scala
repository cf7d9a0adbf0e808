package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, IPs and phones with typed placeholders") {
    val s = "write bob.smith+x@mail.example.org from 192.168.0.12 or call 555-0134 today"
    val out = Seq(Tuple1(s)).toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).collect().head.getString(0)
    assert(out == "write <EMAIL> from <IP> or call <PHONE> today", out)
  }

  test("redactPii leaves clean text and near-miss patterns untouched") {
    val s = "version 1.2.3 of a-b at 12-34 is not pii @handle neither"
    val out = Seq(Tuple1(s)).toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).collect().head.getString(0)
    assert(out == s, out)
  }

  test("piiCount counts matches per pattern") {
    val s = "a@b.co and c@d.org from 10.0.0.1"
    val r = Seq(Tuple1(s)).toDF("text").select(
      TextAnalysis.piiCount(col("text"), TextAnalysis.piiPatterns(0)._2).as("e"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.piiPatterns(1)._2).as("i"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.piiPatterns(2)._2).as("p"))
      .collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 0)))
  }

  test("selfRepetition: unique text scores 0, fully looped text scores high") {
    val unique = "one two three four five six seven eight nine ten"
    val looped = ("spam ham eggs " * 20).trim
    val r = Seq((1L, unique), (2L, looped)).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.selfRepetition(col("text")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 0.0)
    // 58 windows, only 3 distinct shingles → ratio ≈ 0.948
    assert(r(2L) > 0.9, s"looped text must score high: ${r(2L)}")
  }
}
