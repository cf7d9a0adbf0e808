package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Invariants of the token-set ER scorer on random small-vocabulary
  * corpora (heavy form duplication, shared tokens, multi-block):
  * tokenSetRepMatch must equal a straight local reference — collapse
  * forms per (block, name), form-frequency df over distinct names,
  * floor-div integer weights, all in-block rep pairs, one double
  * divide — pair set AND 6-dp similarity both. Permutation invariance
  * follows (a reordered name IS the same token set locally), but is
  * additionally asserted directly. */
object FuzzyJoinProperties extends Properties("graft.ops.FuzzyJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")

  private val genRows: Gen[List[(Long, String, String)]] = for {
    n <- Gen.chooseNum(2, 30)
    rows <- Gen.listOfN(n, for {
      brand <- Gen.oneOf("x", "y")
      k <- Gen.chooseNum(1, 4)
      toks <- Gen.listOfN(k, Gen.oneOf(vocab))
    } yield (brand, toks.mkString(" ")))
  } yield rows.zipWithIndex.map { case ((b, nm), i) => (i.toLong, b, nm) }

  /** Local reference: the scorer's exact contract in plain Scala. */
  private def reference(rows: List[(Long, String, String)], threshold: Double,
                        scale: Long): Set[(Long, Long, Long, Long, Double)] = {
    val forms = rows.groupBy(r => (r._2, r._3)).map { case ((b, nm), rs) =>
      (b, nm, rs.map(_._1).min, rs.size.toLong)
    }.toList
    val names = forms.map(_._2).distinct
    val nf = names.size.toLong
    val df = names.flatMap(nm => nm.split(" ", -1).distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def w(t: String): Long = scale * nf / df(t)
    def wsum(nm: String): Long = nm.split(" ", -1).distinct.map(w).sum
    (for {
      a <- forms; b <- forms
      if a._1 == b._1 && a._3 < b._3
      inter = a._2.split(" ", -1).distinct.toSet
        .intersect(b._2.split(" ", -1).distinct.toSet).toSeq.map(w).sum
      sim = inter.toDouble / (wsum(a._2) + wsum(b._2) - inter).toDouble
      if sim >= threshold
    } yield (a._3, b._3, a._4, b._4,
      BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  property("tokenSetRepMatch == local collapse + weighted-Jaccard reference") = {
    forAll(genRows, Gen.oneOf(0.2, 0.4, 0.7)) { (rows, threshold) =>
      val df = rows.toDF("id", "brand", "name")
      val got = FuzzyJoin.tokenSetRepMatch(df, "id", "name",
        Seq(col("brand")), threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      got == reference(rows, threshold, 1000000L)
    }
  }

  property("permutations of a name always score 1.0 and survive any threshold <= 1") = {
    val genPerm: Gen[(List[String], List[String])] = for {
      k <- Gen.chooseNum(2, 5)
      toks <- Gen.listOfN(k, Gen.oneOf(vocab))
      shuffled <- Gen.const(scala.util.Random.javaRandomToRandom(
        new java.util.Random(toks.hashCode.toLong)).shuffle(toks))
    } yield (toks, shuffled)
    forAll(genPerm) { case (toks, shuffled) =>
      val df = Seq((1L, "b", toks.mkString(" ")), (2L, "b", shuffled.mkString(" ")))
        .toDF("id", "brand", "name")
      val out = FuzzyJoin.tokenSetRepMatch(df, "id", "name", Seq(col("brand")), 1.0)
        .collect()
      // identical token sets: either the same string (collapsed, no
      // pair) or a pair scoring exactly 1.0
      if (toks.mkString(" ") == shuffled.mkString(" ")) out.isEmpty
      else out.length == 1 && out(0).getDouble(4) == 1.0
    }
  }
}
