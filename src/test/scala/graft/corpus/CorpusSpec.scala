package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val benchDoc = "the quick brown fox jumps over the lazy dog tonight"
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over a fence today instead"), // shares shingles
    (2L, "completely unrelated words about storage engines and formats"),
    (3L, benchDoc) // fully contained in the benchmark
  ).toDF("doc_id", "text")
  private def benchmark = Seq((100L, benchDoc)).toDF("doc_id", "text")

  test("contamination flags overlapping docs with the right ratio, skips clean docs") {
    val out = Corpus.contamination(corpus, benchmark).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(!out.contains(2L), "clean doc must not appear")
    assert(out(3L)._1 == out(3L)._2, "identical doc shares every shingle")
    assert(out(3L)._3 == 1.0)
    assert(out(1L)._1 >= 1 && out(1L)._3 < 1.0, s"partial overlap expected: $out")
  }

  test("stratifiedSample is deterministic and respects threshold bounds") {
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def run() = Corpus.stratifiedSample(docs, "lang",
      Map("en" -> (1L << 59)), defaultThreshold = 1L << 58)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = run()
    assert(run() == a, "same input must sample the same rows")
    // 50% target for en, 25% for de — loose bounds on 200 draws each
    val en = a.count(_ % 2 == 0)
    val de = a.count(_ % 2 == 1)
    assert(en > 60 && en < 140, s"en sample far from 50%: $en/200")
    assert(de > 20 && de < 80, s"de sample far from 25%: $de/200")
    // degenerate thresholds: 0 keeps nothing, 2^60 keeps everything
    assert(Corpus.stratifiedSample(docs, "lang", Map.empty, 0L).count() == 0)
    assert(Corpus.stratifiedSample(docs, "lang", Map.empty, 1L << 60).count() == 400)
  }

  test("tfidfTopTerms ranks a doc's distinctive term above corpus-wide terms") {
    val docs = Seq(
      (1L, "shared shared shared zebra"),
      (2L, "shared shared shared"),
      (3L, "shared shared shared")
    ).toDF("doc_id", "text")
    val top = Corpus.tfidfTopTerms(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: zebra (tf 1, df 1) and shared (tf 3, df 3) tie at score 3.0
    // → ascending token tie-break picks "shared" everywhere
    assert(top(1L) == "shared" && top(2L) == "shared" && top(3L) == "shared")
    val docs2 = Seq(
      (1L, "shared zebra zebra"),
      (2L, "shared shared shared"),
      (3L, "shared")
    ).toDF("doc_id", "text")
    val top2 = Corpus.tfidfTopTerms(docs2, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top2(1L) == "zebra", s"rare term must outrank the corpus-wide one: $top2")
  }
}
