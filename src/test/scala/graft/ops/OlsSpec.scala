package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ols.fit2: recovers planted integer-coefficient models exactly on
  * noise-free data, matches a driver-side exact-rational replay on noisy
  * data, and surfaces singular (collinear) designs as det=0 with null
  * coefficients. */
class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted noise-free model exactly") {
    // y = 7 + 3*x1 + 2*x2 exactly; integer features, no noise
    val rows = for (x1 <- 1 to 20; x2 <- 1 to 5)
      yield (7L + 3L * x1 + 2L * x2, x1.toLong, x2.toLong)
    val out = Ols.fit2(rows.toDF("y", "x1", "x2"),
      col("y"), col("x1"), col("x2"))
      .select("n_rows", "b0", "b1", "b2")
      .as[(Long, Double, Double, Double)].collect()(0)
    assert(out == ((100L, 7.0, 3.0, 2.0)))
  }

  test("matches an exact BigInt Cramer replay on noisy data") {
    val rows = Seq.tabulate(50) { i =>
      val x1 = (i * 7) % 13 + 1; val x2 = (i * 5) % 11 + 1
      // deterministic pseudo-noise
      (10L + 2L * x1 + 5L * x2 + (i % 3) - 1, x1.toLong, x2.toLong)
    }
    def bi(l: Iterable[Long]) = l.map(BigInt(_)).sum
    val n = BigInt(rows.length)
    val (s01, s02) = (bi(rows.map(_._2)), bi(rows.map(_._3)))
    val s11 = bi(rows.map(r => r._2 * r._2)); val s12 = bi(rows.map(r => r._2 * r._3))
    val s22 = bi(rows.map(r => r._3 * r._3))
    val t0 = bi(rows.map(_._1)); val t1 = bi(rows.map(r => r._2 * r._1))
    val t2 = bi(rows.map(r => r._3 * r._1))
    def det3(a: BigInt, b: BigInt, c: BigInt, e: BigInt, f: BigInt,
             g: BigInt, h: BigInt, i: BigInt, j: BigInt) =
      a * (f * j - g * i) - b * (e * j - g * h) + c * (e * i - f * h)
    val det = det3(n, s01, s02, s01, s11, s12, s02, s12, s22)
    val want = (
      det3(t0, s01, s02, t1, s11, s12, t2, s12, s22).toDouble / det.toDouble,
      det3(n, t0, s02, s01, t1, s12, s02, t2, s22).toDouble / det.toDouble,
      det3(n, s01, t0, s01, s11, t1, s02, s12, t2).toDouble / det.toDouble)
    val got = Ols.fit2(rows.toDF("y", "x1", "x2"), col("y"), col("x1"), col("x2"))
      .select("b0", "b1", "b2").as[(Double, Double, Double)].collect()(0)
    assert(got == want)
  }

  test("per-group fit equals the global fit of each group's own rows") {
    val rows = (for (g <- Seq("a", "b"); x1 <- 1 to 15; x2 <- 1 to 4) yield {
      val mult = if (g == "a") 3L else 8L
      (g, 5L + mult * x1 + 2L * x2, x1.toLong, x2.toLong)
    })
    val df = rows.toDF("g", "y", "x1", "x2")
    val grouped = Ols.fit2PerGroup(df, "g", col("y"), col("x1"), col("x2"))
    for (g <- Seq("a", "b")) {
      val whole = Ols.fit2(df.filter(col("g") === g),
        col("y"), col("x1"), col("x2"))
      assert(rowSet(grouped.filter(col("g") === g).drop("g")) == rowSet(whole), g)
    }
    // and the planted slopes are recovered exactly per group
    val slopes = grouped.select("g", "b1").as[(String, Double)].collect().toMap
    assert(slopes == Map("a" -> 3.0, "b" -> 8.0))
  }

  test("collinear design yields det 0 and null coefficients") {
    val rows = Seq.tabulate(30)(i => ((i + 1).toLong, (i + 1).toLong, (2 * i + 2).toLong))
    val out = Ols.fit2(rows.toDF("y", "x1", "x2"), col("y"), col("x1"), col("x2"))
      .select(col("det"), col("b1").isNull).as[(Double, Boolean)].collect()(0)
    assert(out == ((0.0, true)))
  }

  test("conformal2 == plain-Scala mirror (md5 split, BigInt Cramer, rank-picked residual)") {
    def u52(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16)
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rnd = new scala.util.Random(7)
    // noisy planted model y = 10 + 3*x1 - 2*x2 + e
    val rows = Seq.tabulate(80) { i =>
      val x1 = rnd.nextInt(50).toLong; val x2 = rnd.nextInt(50).toLong
      (i.toLong, 10L + 3 * x1 - 2 * x2 + rnd.nextInt(9) - 4, x1, x2)
    }
    val got = Ols.conformal2(rows.toDF("id", "y", "x1", "x2"),
      col("id"), col("y"), col("x1"), col("x2"), q = 0.9).collect()(0)
    // --- mirror ---
    val (cal, train) = rows.partition { case (id, _, _, _) => u52(id) % 2 == 1 }
    def bi(l: Long) = BigInt(l)
    val (s00, s01, s02) = (bi(train.size), train.map(r => bi(r._3)).sum, train.map(r => bi(r._4)).sum)
    val s11 = train.map(r => bi(r._3) * bi(r._3)).sum
    val s12 = train.map(r => bi(r._3) * bi(r._4)).sum
    val s22 = train.map(r => bi(r._4) * bi(r._4)).sum
    val (t0, t1, t2) = (train.map(r => bi(r._2)).sum,
      train.map(r => bi(r._3) * bi(r._2)).sum, train.map(r => bi(r._4) * bi(r._2)).sum)
    def det3(a: BigInt, b: BigInt, c: BigInt, e: BigInt, f: BigInt, g: BigInt,
             h: BigInt, i: BigInt, j: BigInt) =
      a * (f * j - g * i) - b * (e * j - g * h) + c * (e * i - f * h)
    val det = det3(s00, s01, s02, s01, s11, s12, s02, s12, s22)
    assert(det != 0, "fixture must be non-collinear")
    val b0 = det3(t0, s01, s02, t1, s11, s12, t2, s12, s22).toDouble / det.toDouble
    val b1 = det3(s00, t0, s02, s01, t1, s12, s02, t2, s22).toDouble / det.toDouble
    val b2 = det3(s00, s01, t0, s01, s11, t1, s02, s12, t2).toDouble / det.toDouble
    def resid(r: (Long, Long, Long, Long)): Double =
      math.abs(r._2.toDouble - (b0 + b1 * r._3.toDouble + b2 * r._4.toDouble))
    val nCal = cal.size
    val qRank = math.max(1L, math.min(nCal.toLong, math.ceil(0.9 * (nCal + 1)).toLong))
    val qHat = cal.map(r => (resid(r), r._1)).sorted.apply(qRank.toInt - 1)._1
    val cov = round6(train.count(r => resid(r) <= qHat).toDouble / train.size)
    assert(got.getLong(0) == train.size.toLong && got.getLong(1) == nCal.toLong &&
      got.getLong(2) == qRank && got.getDouble(3) == round6(qHat) &&
      got.getDouble(4) == cov,
      s"got $got, want (${train.size}, $nCal, $qRank, ${round6(qHat)}, $cov)")
    // the finite-sample guarantee holds on the calibration half by construction
    val calCov = cal.count(r => resid(r) <= qHat).toDouble / nCal
    assert(calCov >= qRank.toDouble / nCal - 1e-12)
  }

  test("conformalPerGroup == conformal2 run per group slice (grid rank pick == strict rank pick)") {
    val rnd = new scala.util.Random(11)
    // three groups with different models and noise scales
    val rows = for {
      (g, (a, b, noise)) <- Seq("en" -> (5L, 2L, 3), "de" -> (40L, -1L, 9),
        "fr" -> (0L, 4L, 1))
      i <- 0 until 90
    } yield {
      val x1 = rnd.nextInt(40).toLong; val x2 = rnd.nextInt(40).toLong
      (g, (g.hashCode.toLong.abs % 97) * 1000 + i,
        a + b * x1 + 2 * x2 + rnd.nextInt(2 * noise + 1) - noise, x1, x2)
    }
    val df = rows.toDF("lang", "id", "y", "x1", "x2")
    val grouped = Ols.conformalPerGroup(df, col("lang"), col("id"), col("y"),
      col("x1"), col("x2"), q = 0.9)
    for (g <- Seq("en", "de", "fr")) {
      val solo = Ols.conformal2(df.filter(col("lang") === g),
        col("id"), col("y"), col("x1"), col("x2"), q = 0.9)
      assert(rowSet(grouped.filter(col("grp") === g).drop("grp")) == rowSet(solo),
        s"group $g diverged from its solo conformal2")
    }
  }

  test("conformalPerGroup: group-conditional coverage >= q on exchangeable fixtures") {
    // iid-per-group fixtures (the exchangeability premise); train rows
    // were NOT used for calibration, so their coverage estimates the
    // guarantee's marginal probability — allow binomial slack at n~130
    for (seed <- Seq(3, 17, 29)) {
      val rnd = new scala.util.Random(seed)
      val rows = for {
        g <- Seq("a", "b"); i <- 0 until 260
      } yield {
        val x1 = rnd.nextInt(30).toLong; val x2 = rnd.nextInt(30).toLong
        val noise = if (g == "a") 4 else 12
        (g, g(0).toLong * 10000 + i, 7 + 3 * x1 - x2 +
          rnd.nextInt(2 * noise + 1) - noise, x1, x2)
      }
      val out = Ols.conformalPerGroup(rows.toDF("g", "id", "y", "x1", "x2"),
        col("g"), col("id"), col("y"), col("x1"), col("x2"), q = 0.9)
        .select(col("grp"), col("train_coverage")).as[(String, Double)].collect().toMap
      assert(out.size == 2, out.toString)
      out.foreach { case (g, cov) =>
        assert(cov >= 0.9 - 0.08, s"seed $seed group $g coverage $cov < q - slack")
      }
    }
  }
}
