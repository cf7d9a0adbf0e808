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

  test("gopherRules flags each failure mode independently") {
    import org.apache.spark.sql.functions._
    val good = (1 to 12).map(_ => "the quick brown fox ran").mkString(" ") // 60 tokens, stopwords, alpha
    val docs = Seq(
      (1L, good),
      (2L, "too short to keep"),                                // fails word count
      (3L, (1 to 60).map(_ => "#### $$$$").mkString(" ")),      // symbols, no alpha, no stopwords
      (4L, (1 to 60).map(_ => "a b").mkString(" "))             // mean word len 1 < 3
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.gopherRules(TextAnalysis.textStats(col("text")), minWords = 20).as("r"))
      .select(col("doc_id"), col("r.*")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)), s"clean doc keeps: ${out(1L)}")
    assert(!out(2L)._1 && !out(2L)._6, "short doc fails word count and keep")
    assert(!out(3L)._3 && !out(3L)._4 && !out(3L)._5 && !out(3L)._6,
      s"symbol doc fails symbol/alpha/stopword rules: ${out(3L)}")
    assert(!out(4L)._2 && !out(4L)._6, s"tiny words fail mean length: ${out(4L)}")
  }
}
