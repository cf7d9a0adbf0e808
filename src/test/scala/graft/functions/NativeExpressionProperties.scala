package graft.functions

import graft.TestSpark
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based parity: every native expression must agree with its
  * column-function (HOF) reference form on adversarial random text —
  * whitespace runs at either end, tabs/newlines, quotes, unicode,
  * empty strings. Each property batches its samples into one DataFrame
  * so a run costs one Spark job. */
object NativeExpressionProperties extends Properties("graft.native") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  private val V = org.apache.spark.sql.graftext.VectorExpressions

  // Piece-wise (not per-char) so supplementary-plane characters — which
  // are surrogate PAIRS in UTF-16 — can appear; they are where
  // code-unit vs code-point counting diverges, so the generator must
  // produce them for the parity properties to mean anything.
  private val genPiece: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.const(" "),
    1 -> Gen.oneOf('\t', '\n', '\r').map(_.toString),
    1 -> Gen.oneOf('"', ',', '.', '!', '[', ']').map(_.toString),
    1 -> Gen.oneOf('é', '中', '文').map(_.toString),
    1 -> Gen.oneOf("😀", "🚀", "𝕏", "𠀀")) // astral: U+1F600, U+1F680, U+1D54F, U+20000

  private val genText: Gen[String] = Gen.frequency(
    9 -> Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, genPiece).map(_.mkString)),
    1 -> Gen.const(""))

  private val genBatch: Gen[List[String]] = Gen.listOfN(6, genText)

  private def df(texts: List[String]) = {
    import spark.implicits._
    texts.map(Tuple1(_)).toDF("text")
  }

  private def agree(texts: List[String], fast: org.apache.spark.sql.Column,
                    ref: org.apache.spark.sql.Column): Boolean =
    df(texts).select(fast.as("a"), ref.as("b")).collect()
      .forall { r: Row => r.get(0) == r.get(1) }

  private val toks = TextAnalysis.tokens(col("text"))

  property("JaroWinkler codegen == kernel eval; symmetric on adversarial text") =
    forAll(Gen.listOfN(6, Gen.zip(genText, genText))) { ps =>
      import spark.implicits._
      val rows = ps.toDF("a", "b")
        .select(V.jaroWinkler(col("a"), col("b")).as("x"),
          V.jaroWinkler(col("b"), col("a")).as("y")).collect()
      rows.zip(ps).forall { case (r, (a, b)) =>
        val k = org.apache.spark.sql.graftext.GraftKernels.jaroWinkler(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.unsafe.types.UTF8String.fromString(b))
        r.getDouble(0) == k && r.getDouble(1) == k && k >= 0.0 && k <= 1.0
      }
    }

  property("RollingNgrams == HOF shingles") = forAll(genBatch) { ts =>
    agree(ts, Dedup.shingles(col("text")), Dedup.shinglesHof(col("text")))
  }

  property("RollingHashes == HOF rolling fingerprints") = forAll(genBatch) { ts =>
    agree(ts, TextAnalysis.rollingFingerprints(col("text")),
      TextAnalysis.rollingFingerprintsHof(col("text")))
  }

  property("NormalizeWs == regexp_replace(lower)") = forAll(genBatch) { ts =>
    agree(ts, V.normalizeWs(col("text")),
      regexp_replace(lower(col("text")), "\\s+", " "))
  }

  property("Md5Hashes60 == conv(substr(md5)) per token") = forAll(genBatch) { ts =>
    agree(ts, V.md5Hashes60(toks), transform(toks, t => Dedup.md5Hash60(t)))
  }

  property("Md5WindowHashes60 == per-window array_join/md5 HOF (incl. clipped boundary)") =
    forAll(genBatch, Gen.chooseNum(1, 6)) { (ts, w) =>
      agree(ts, V.md5WindowHashes60(toks, w),
        transform(sequence(lit(1), greatest(size(toks) - (w - 1), lit(1))),
          i => Dedup.md5Hash60(array_join(slice(toks, i, lit(w)), " "))))
    }

  property("SimHashFrom == aggregate/zip_with fold") = forAll(genBatch) { ts =>
    agree(ts, V.simhashFrom(V.md5Hashes60(toks), 60),
      Dedup.simhashFrom(V.md5Hashes60(toks), 60))
  }

  property("Md5Min == array_min(transform(md5))") = forAll(genBatch) { ts =>
    agree(ts, V.md5Min(Dedup.shingles(col("text"))),
      array_min(transform(Dedup.shingles(col("text")), g => md5(g.cast("binary")))))
  }

  property("Md5MinHash == double-hashing HOF") = forAll(genBatch) { ts =>
    val sh = Dedup.shingles(col("text"))
    agree(ts, V.md5MinHash(sh, 8),
      transform(sequence(lit(0), lit(7)), j => array_min(transform(sh,
        g => conv(substring(md5(g.cast("binary")), 1, 14), 16, 10).cast("long")
          + j * conv(substring(md5(g.cast("binary")), 17, 14), 16, 10).cast("long")))))
  }

  // null ELEMENTS included: the native form quantizes them to code 0,
  // and the HOF parity form must agree (it coalesces them to 0.0)
  private val genVec: Gen[Seq[Option[Float]]] = for {
    n <- Gen.frequency(8 -> Gen.chooseNum(1, 16), 1 -> Gen.const(0))
    xs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.chooseNum(-1000000, 1000000).map(i => Option(i / 1000f)),
      1 -> Gen.const(Option(0f)),
      1 -> Gen.const(Option.empty[Float])))
  } yield xs

  property("QuantizeInt8 (scale, q) == HOF form") =
    forAll(Gen.listOfN(6, genVec)) { vecs =>
      import spark.implicits._
      vecs.map(Tuple1(_)).toDF("v")
        .select(graft.sim.Similarity.quantizeInt8(col("v")).as("a"),
          graft.sim.Similarity.quantizeInt8Hof(col("v")).as("b"))
        .collect().forall { r =>
          val a = r.getStruct(0); val b = r.getStruct(1)
          a.getDouble(0) == b.getDouble(0) &&
            a.getSeq[Byte](1) == b.getSeq[Byte](1) &&
            // the checksum fields must agree with the codes they summarize
            a.getLong(2) == a.getSeq[Byte](1).map(_.toLong).sum &&
            (a.getSeq[Byte](1).isEmpty ||
              (a.getInt(3) == a.getSeq[Byte](1).map(_.toInt).min &&
               a.getInt(4) == a.getSeq[Byte](1).map(_.toInt).max))
        }
    }

  property("TextStats fields == per-counter column functions") = forAll(genBatch) { ts =>
    val t = col("text")
    df(ts).select(
      TextAnalysis.textStats(t).as("st"),
      TextAnalysis.tokenCount(t).as("c1"),
      TextAnalysis.maxTokenLen(t).as("c2"),
      TextAnalysis.punctCount(t).as("c3"),
      TextAnalysis.stopwordCount(t).as("c4"),
      TextAnalysis.wordCharCount(t).as("c5"),
      TextAnalysis.alphaTokenCount(t).as("c6")).collect()
      .forall { r =>
        val st = r.getStruct(0)
        st.getInt(0) == r.getInt(1) && st.getInt(1) == r.getInt(2) &&
          st.getInt(2) == r.getInt(3) && st.getInt(3) == r.getInt(4) &&
          st.getInt(4) == r.getInt(5) && st.getInt(5) == r.getInt(6)
      }
  }
}
