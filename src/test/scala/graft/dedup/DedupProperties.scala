package graft.dedup

import graft.TestSpark
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Brute-force invariant for the duplicated-span FAMILY report on
  * random adversarial corpora (tiny alphabet → dense window
  * collisions, self-repeats, cross-doc shares, adjacent runs): the
  * engine's (span_tokens, n_docs, n_spans, example_doc) multiset must
  * equal a straight in-memory reference that slices token windows,
  * counts them corpus-wide, splits consecutive duplicated windows into
  * maximal runs, and groups runs by their literal content sequence —
  * the definition, with none of the engine's hashing, islands-window
  * or checkpoint machinery. Family identity via md5-of-hash-sequence
  * vs literal content is exactly the collision-freeness the operator
  * banks on, so the multisets agree iff the machinery is faithful.
  */
object DedupProperties extends Properties("graft.dedup.Dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(2, 6)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.chooseNum(0, 20)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }

  /** The definition, computed locally: windows → corpus counts → dup
    * windows → consecutive runs per doc → families by content. */
  private def refFamilies(docs: List[(Long, String)],
                          w: Int): List[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toVector }
      .filter(_._2.size >= w)
    val wins = for {
      (id, tv) <- toks
      j <- 0 to tv.size - w
    } yield (id, j, tv.slice(j, j + w))
    val counts = wins.groupBy(_._3).map { case (k, xs) => k -> xs.size }
    val dup = wins.filter(x => counts(x._3) >= 2)
    val runs: List[(Long, Vector[Vector[String]], Int)] =
      dup.groupBy(_._1).toList.flatMap { case (id, xs) =>
        val sorted = xs.sortBy(_._2)
        val groups = sorted.foldLeft(List.empty[List[(Long, Int, Vector[String])]]) {
          case (((h @ ((_, pj, _) :: _)) :: rest), x) if x._2 == pj + 1 =>
            (x :: h) :: rest
          case (acc, x) => List(x) :: acc
        }
        groups.map { g =>
          val gs = g.reverse
          (id, gs.map(_._3).toVector, gs.size + w - 1)
        }
      }
    runs.groupBy(_._2).map { case (_, xs) =>
      (xs.head._3.toLong, xs.map(_._1).distinct.size.toLong,
        xs.size.toLong, xs.map(_._1).min)
    }.toList
  }

  property("dupSpanFamilies == the literal windows/runs/families definition") = {
    forAll(genCorpus, Gen.chooseNum(2, 3)) { (docs, w) =>
      val out = Dedup.dupSpanFamilies(docs.toDF("doc_id", "text"), w = w, topK = 10000)
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toList.sorted
      val ref = refFamilies(docs, w).sorted
      if (out != ref)
        println(s"MISMATCH w=$w docs=$docs\n engine=$out\n ref=$ref")
      out == ref
    }
  }
}
