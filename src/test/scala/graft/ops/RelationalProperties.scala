package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Invariants of the distributed order-statistics primitives on random
  * adversarial inputs — duplicates, negatives, skew and tiny/huge
  * bucket counts:
  *   - exactNtile reproduces the literal NTILE definition computed by
  *     a straight local sort (the n mod b extra-row rule included);
  *   - prefixSum/prefixMax equal scanLeft over the locally-sorted
  *     rows, for any partitioning Spark happens to choose;
  *   - bloomPrunedJoin returns exactly the plain join (the
  *     no-false-negatives contract), whatever the key overlap;
  *   - joinDeltaRows' three terms always reconstruct the full join.
  */
object RelationalProperties extends Properties("graft.ops.Relational") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genVals: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 60)
    vs <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
  } yield vs

  property("exactNtile == local NTILE definition, duplicates included") = {
    forAll(genVals, Gen.chooseNum(1, 12)) { (vs, b) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
      val out = Relational.exactNtile(rows.toDF("v", "id"), b, Seq("v", "id"), "bk")
        .select(col("id"), col("bk")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = rows.size
      val base = n / b; val rem = n % b
      val expected = rows.sortBy(x => (x._1, x._2)).zipWithIndex.map { case ((_, id), i0) =>
        val rank = i0 + 1L
        val bk = if (base == 0) rank
          else if (rank <= (base + 1L) * rem) (rank - 1) / (base + 1) + 1
          else rem + (rank - 1 - (base + 1L) * rem) / base + 1
        id -> bk
      }.toMap
      out == expected
    }
  }

  property("groupedPercentRank == PERCENT_RANK window on random grouped data with ties") = {
    val genRows: Gen[List[(String, Long)]] = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 8L))) // small domain forces ties
    } yield rows
    forAll(genRows) { rows =>
      import org.apache.spark.sql.expressions.Window
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val fast = Relational.groupedPercentRank(df, "g", "v", "pr")
        .select(col("id"), col("pr")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ref = df.withColumn("pr", org.apache.spark.sql.functions.percent_rank()
          .over(Window.partitionBy(col("g")).orderBy(col("v"))))
        .select(col("id"), col("pr")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      fast == ref
    }
  }

  property("groupedPercentRank == PERCENT_RANK window with NULL groups and NULL values") = {
    // r11 advisor fix: the joins are null-safe, so null-keyed rows keep
    // the rank the window they replace would give them (nulls first)
    val genRows: Gen[List[(Option[String], Option[Long])]] = for {
      n <- Gen.chooseNum(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.oneOf(Some("a"), Some("b"), None),
        Gen.oneOf(Gen.chooseNum(0L, 5L).map(Some(_)), Gen.const(None))))
    } yield rows
    forAll(genRows) { rows =>
      import org.apache.spark.sql.expressions.Window
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val fast = Relational.groupedPercentRank(df, "g", "v", "pr")
        .select(col("id"), col("pr")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ref = df.withColumn("pr", org.apache.spark.sql.functions.percent_rank()
          .over(Window.partitionBy(col("g")).orderBy(col("v"))))
        .select(col("id"), col("pr")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      fast == ref
    }
  }

  property("prefixSum/prefixMax == scanLeft over the local sort") = {
    forAll(genVals) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("t", "v")
      val sums = Relational.prefixSum(df, Seq(col("t")), "v", "run")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val maxs = Relational.prefixMax(df, Seq(col("t")), "v", "hwm")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val sorted = rows.sortBy(_._1)
      val expSum = sorted.map(_._2).scanLeft(0L)(_ + _).tail
      val expMax = sorted.map(_._2).scanLeft(Long.MinValue)(math.max).tail
      sorted.map(_._1).zip(expSum).toMap == sums &&
        sorted.map(_._1).zip(expMax).toMap == maxs
    }
  }

  property("bloomPrunedJoin == the plain join for any key overlap") = {
    val genKeys = Gen.listOf(Gen.chooseNum(0L, 30L))
    forAll(genKeys, genKeys) { (bigKeys, smallKeys0) =>
      val smallKeys = smallKeys0.distinct
      (bigKeys.nonEmpty && smallKeys.nonEmpty) ==> {
        val big = bigKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row")
        val small = smallKeys.toDF("sk")
        val got = Relational.bloomPrunedJoin(big, small, "k", "sk")
          .select(col("row")).collect().map(_.getLong(0)).sorted.toSeq
        val want = bigKeys.zipWithIndex
          .filter { case (k, _) => smallKeys.contains(k) }.map(_._2.toLong).sorted
        got == want
      }
    }
  }

  property("joinDeltaRows reconstructs the full join under any base/delta split") = {
    val genSide = Gen.listOf(Gen.chooseNum(0L, 15L))
    forAll(genSide, genSide, Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) {
      (aKeys, bKeys, aCut, bCut) =>
        (aKeys.nonEmpty && bKeys.nonEmpty) ==> {
          val a = aKeys.zipWithIndex.map { case (k, i) => (k, s"a$i") }
          val b = bKeys.zipWithIndex.map { case (k, i) => (k, s"b$i") }
          val (a0, a1) = a.splitAt(a.size * aCut / 100)
          val (b0, b1) = b.splitAt(b.size * bCut / 100)
          def d(xs: Seq[(Long, String)], k: String, p: String) =
            if (xs.isEmpty) Seq.empty[(Long, String)].toDF(k, p) else xs.toDF(k, p)
          val v0 = d(a0, "ak", "ap").join(d(b0, "bk", "bp"), col("ak") === col("bk"))
          val maintained = v0.unionByName(Relational.joinDeltaRows(
            d(a0, "ak", "ap"), d(a1, "ak", "ap"),
            d(b0, "bk", "bp"), d(b1, "bk", "bp"), "ak", "bk"))
          val direct = d(a, "ak", "ap").join(d(b, "bk", "bp"), col("ak") === col("bk"))
          maintained.collect().map(_.toString).sorted.toSeq ==
            direct.collect().map(_.toString).sorted.toSeq
        }
    }
  }

  property("bootstrapCiPoisson == plain-Scala md5/threshold/percentile mirror") = {
    val thresholds = Seq(1656781714176973L, 3313563428353947L,
      4141954285442434L, 4418084571138597L, 4487117142562637L,
      4500923656847445L, 4503224742561580L, 4503553469092171L)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // two 52-bit uniforms per digest: hex chars 1-13 and 17-29 of
    // md5("key_blk") serve reps 2*blk and 2*blk+1
    def draws(key: Long, b: Int): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until (b + 1) / 2).flatMap { blk =>
        val hex = md.digest(s"${key}_$blk".getBytes("UTF-8"))
          .map(x => f"$x%02x").mkString
        Seq(java.lang.Long.parseLong(hex.substring(0, 13), 16),
          java.lang.Long.parseLong(hex.substring(16, 29), 16))
      }.take(b).map { u =>
        thresholds.indexWhere(u < _) match { case -1 => 8L; case i => i.toLong }
      }
    }
    val genOrders: Gen[List[(Long, Double)]] = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(1L, 1000000L), Gen.chooseNum(1, 99999)))
    } yield rows.map { case (k, c) => (k, c / 100.0) }
      .groupBy(_._1).map(_._2.head).toList // distinct order keys
    forAll(genOrders, Gen.oneOf(8, 16, 64)) { (rows, b) =>
      val df = rows.toDF("o_orderkey", "o_totalprice")
      val got = Relational.bootstrapCiPoisson(df, b).collect()(0)
      // local mirror, identical arithmetic and rank convention
      val cents = rows.map { case (k, p) => (k, math.round(p * 100)) }
      val perRowDraws = cents.map { case (key, c) => (draws(key, b), c) }
      val means = (0 until b).flatMap { rep =>
        val ks = perRowDraws.map { case (ds, c) => (ds(rep), ds(rep) * c) }
        val m = ks.map(_._1).sum
        if (m == 0) None
        else Some((BigInt(ks.map(_._2).sum).toDouble / m.toDouble / 100.0, rep))
      }.sortBy(identity)
      // ranks over the SURVIVING rep count (reps with zero Poisson mass
      // drop out) — the engine's convention, so tiny inputs still get a
      // non-NULL CI instead of an unoccupied rank
      val g = means.size
      val loRank = math.ceil(0.025 * g).toInt.max(1)
      val hiRank = math.ceil(0.975 * g).toInt
      val lo = if (g >= 1) Some(round6(means(loRank - 1)._1)) else None
      val hi = if (g >= 1) Some(round6(means(hiRank - 1)._1)) else None
      val mean = round6(cents.map(c => BigInt(c._2)).sum.toDouble / rows.size / 100.0)
      val gotLo = if (got.isNullAt(3)) None else Some(got.getDouble(3))
      val gotHi = if (got.isNullAt(4)) None else Some(got.getDouble(4))
      got.getLong(0) == rows.size.toLong && got.getLong(1) == b.toLong &&
        got.getDouble(2) == mean && gotLo == lo && gotHi == hi
    }
  }
}
