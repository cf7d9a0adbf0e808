package graft.dedup

import graft.TestSpark
import graft.corpus.Corpus
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the sub-document dedup family — each
  * property runs a small Spark job, so the test count is kept low.
  * These pin the algorithms' PAPER guarantees on random inputs, which
  * the example-based specs cannot sweep. */
object DedupProperties extends Properties("dedup.subdoc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  /** Random word-soup doc of n tokens over a small alphabet (repeats
    * likely — the interesting regime for window hashing). */
  private def genDoc(minLen: Int, maxLen: Int): Gen[String] = for {
    n <- Gen.chooseNum(minLen, maxLen)
    toks <- Gen.listOfN(n, Gen.oneOf((1 to 40).map(i => s"t$i")))
  } yield toks.mkString(" ")

  /** Winnowing's detection guarantee (Schleimer et al. 2003): if two
    * docs share a contiguous run of ≥ w + k − 1 tokens, they share at
    * least one selected fingerprint. Planted by splicing a common run
    * into two random docs. */
  property("winnowing guarantee: shared run >= w+k-1 yields shared fingerprint") =
    forAll(genDoc(6, 20), genDoc(6, 20), Gen.listOfN(7, Gen.identifier.map("s" + _.take(6)))) {
      (a, b, sharedToks) =>
        import spark.implicits._
        val shared = sharedToks.mkString(" ") // 7 = w + k - 1 at k=4, w=4
        val docs = Seq((1L, s"$a $shared"), (2L, s"$shared $b")).toDF("doc_id", "text")
        val fps = Dedup.winnowFingerprints(docs, k = 4, w = 4).collect()
          .map(r => r.getLong(0) -> r.getLong(1))
        val by = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        (by(1L) & by(2L)).nonEmpty
    }

  /** removeDupSpans invariants: token counts never grow, the globally
    * smallest doc id containing any window is never edited, and a doc
    * with no duplicated window round-trips exactly. */
  property("removeDupSpans: kept <= total; min-id owner doc unchanged") =
    forAll(genDoc(8, 24), genDoc(8, 24)) { (a, b) =>
      import spark.implicits._
      val docs = Seq((1L, a), (2L, b), (3L, a)).toDF("doc_id", "text") // 3 dups 1
      val out = Dedup.removeDupSpans(docs, w = 6).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      def md5Of(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString
      val aToks = a.trim.split("\\s+").length
      out.values.forall { case (n, kept, _) => kept <= n } &&
        // doc 1 is the min id for every window it contains -> untouched
        out(1L)._3 == md5Of(a.split("\\s+").mkString(" ")) &&
        // doc 3 (exact copy, higher id): if a has >= 6 tokens its
        // windows are all owned by doc 1, so every token is covered
        (aToks < 6 || out(3L)._2 == 0L)
    }

  /** CDC chunking invariants: chunks partition the token stream (sizes
    * sum to the doc's token count) and chunking is deterministic. */
  property("cdcChunks: chunks partition the doc; deterministic") =
    forAll(genDoc(1, 30)) { a =>
      import spark.implicits._
      val docs = Seq((1L, a)).toDF("doc_id", "text")
      val one = Corpus.cdcChunks(docs).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
      val two = Corpus.cdcChunks(docs).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
      val nToks = a.trim.split("\\s+").length
      one.map(_._2).sum == nToks.toLong &&
        one.map(_._1).toSeq == one.indices.map(_.toLong) &&
        one.toSeq == two.toSeq
    }
}
