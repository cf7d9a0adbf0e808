package graft.ops

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("runChecks: each constraint kind counts its violations; passed iff zero") {
    val child = Seq(
      (Some(1L), Some("O"), 5.0),
      (Some(1L), Some("F"), 60.0), // dup key + out-of-range
      (Some(2L), Some("Z"), 10.0), // bad domain
      (None, None, 20.0) // null key (uniqueness+completeness+domain violations)
    ).toDF("k", "status", "qty")
    val parent = Seq(1L).toDF("pk") // child key 2 and NULL are orphans
    val out = DataQuality.runChecks(Seq(
      DataQuality.Completeness(child, "child", "k"),
      DataQuality.Uniqueness(child, "child", Seq("k")),
      DataQuality.InSet(child, "child", "status", Seq("O", "F")),
      DataQuality.InRange(child, "child", "qty", 1d, 50d),
      DataQuality.ForeignKey(child, "child", "k", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("completeness:child.k") == ((4L, 1L, false)))
    // 4 rows, 2 distinct non-null keys -> 2 violations (the dup AND the null)
    assert(out("uniqueness:child.k") == ((4L, 2L, false)))
    assert(out("in_set:child.status") == ((4L, 2L, false)), "NULL and 'Z' both violate the domain")
    assert(out("in_range:child.qty") == ((4L, 1L, false)))
    assert(out("foreign_key:child.k") == ((4L, 2L, false)), "key 2 and the NULL key are orphans")
    val clean = DataQuality.runChecks(Seq(
      DataQuality.Completeness(parent, "parent", "pk"))).collect().head
    assert(clean.getBoolean(3), "a violation-free check must report passed=true")
  }

  test("runChecks: an EMPTY table reports 0 violations and passed=true, not NULL") {
    val empty = Seq.empty[(Option[Long], Double)].toDF("k", "qty")
    val out = DataQuality.runChecks(Seq(
      DataQuality.Completeness(empty, "t", "k"),
      DataQuality.InRange(empty, "t", "qty", 0d, 1d),
      DataQuality.Uniqueness(empty, "t", Seq("k"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("completeness:t.k") == ((0L, 0L, true)))
    assert(out("in_range:t.qty") == ((0L, 0L, true)))
    assert(out("uniqueness:t.k") == ((0L, 0L, true)))
  }

  test("runChecks: duplicate check names are rejected") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      DataQuality.runChecks(Seq(
        DataQuality.Completeness(df, "t", "k"), DataQuality.Completeness(df, "t", "k")))
    }
  }

  test("rollingZscore: exact z from trailing-window moments, self-excluded; short and flat windows skipped") {
    // group g: priors (1.00, 3.00) then a 10.00 spike.
    //   k=2, S=400, Q=100000 (cents): z = (2*1000-400)/sqrt((2*100000-160000)*2/1)
    //     = 1600/sqrt(80000) = 5.656854
    val df = Seq(
      ("g", 1, 1.00), ("g", 2, 3.00), ("g", 3, 10.00),
      // group h: constant priors -> zero variance -> skipped, never 1/0
      ("h", 1, 5.00), ("h", 2, 5.00), ("h", 3, 9.99)).toDF("grp", "seq", "v")
    val out = DataQuality.rollingZscore(df, "grp", Seq("seq"), "v",
      window = 10, minPrior = 2, threshold = 1.0)
    val rows = out.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(rows == Map(("g", 3) -> 5.656854),
      s"spike row only: first rows lack $rows predecessors, zero-variance window skipped")
  }

  test("rollingZscore: minPrior below 2 is rejected (sample std undefined)") {
    val df = Seq(("g", 1, 1.0)).toDF("grp", "seq", "v")
    intercept[IllegalArgumentException] {
      DataQuality.rollingZscore(df, "grp", Seq("seq"), "v", minPrior = 1)
    }
  }

  test("benford: first digits from exact integer strings; non-positive excluded; known expectations") {
    val df = Seq(1.23, 0.05, 2.00, 19.99, -5.0, 0.0).toDF("v")
    val out = DataQuality.benford(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // digits of cents: 123->1, 5->5, 200->2, 1999->1; -5 and 0 excluded
    assert(out.keySet == Set(1, 2, 5))
    assert(out(1) == ((2L, 0.5, 0.30103, 0.19897)))
    assert(out(2)._1 == 1L && out(2)._2 == 0.25 && out(2)._3 == 0.176091)
    assert(out(5)._1 == 1L && out(5)._3 == 0.079181)
  }

  test("welchT: hand-computed two-sample statistic, exact moments to one double chain") {
    import spark.implicits._
    // A = [1, 2, 3] (var 1), B = [5, 5, 8] (var 3): t = -400/sqrt(40000/3) cents,
    // dof = 3.2 by Welch-Satterthwaite
    val df = (Seq(1.0, 2.0, 3.0).map(("click", _)) ++
      Seq(5.0, 5.0, 8.0).map(("purchase", _)) ++
      Seq(("view", 99.0))).toDF("event_type", "value") // third group: excluded
    val r = DataQuality.welchT(df, "event_type", "value", "click", "purchase")
      .collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 6.0)
    assert(r.getAs[Double]("t_stat") == -3.464102, r.toString)
    assert(r.getAs[Double]("dof") == 3.2, r.toString)
  }

  test("rollingZscore fails fast when the input carries a reserved working column") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1.0, 9.9)).toDF("g", "o", "v", "z")
    val e = intercept[IllegalArgumentException] {
      DataQuality.rollingZscore(df, "g", Seq("o"), "v")
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("madDaily: exact medians in doubled units — odd and even day counts, outlier-immune") {
    // type a over 5 days: counts [1,2,3,2,100] → median 2, deviations
    // sorted [0,0,1,1,98] → MAD 1 (the 100-spike never moves either);
    // type b over 2 days: [1,3] → median 2.0 (interpolated), MAD 1.0
    val rows =
      Seq(("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 2), ("a", 5, 100),
        ("b", 1, 1), ("b", 2, 3)).flatMap { case (t, d, n) =>
        (1 to n).map(i => (t, f"2024-04-$d%02d ${i / 60}%02d:${i % 60}%02d:00"))
      }
    import org.apache.spark.sql.functions._
    val ev = rows.toDF("event_type", "ts_s")
      .select(col("event_type"), col("ts_s").cast("timestamp").as("ts"))
    val out = DataQuality.madDaily(ev)
    // cols sorted: event_type|mad_daily|median_daily|n_days
    assert(rowSet(out) == Set("a|1.0|2.0|5", "b|1.0|2.0|2"), rowSet(out).toString)
  }

  test("ksDrift: exact rational ECDF gap; smallest attaining value reported") {
    // A = {1, 2}, B = {2, 3}: gaps |ra·nb − rb·na| over v = [2, 2, 0]
    // → D = 2/4 = 0.5, first attained at v = 1
    val docs = Seq(("src0", 1L), ("src0", 2L), ("src1", 2L), ("src1", 3L),
      ("other", 999L)) // a third source must not leak in
      .toDF("source", "n_chars")
    val out = DataQuality.ksDrift(docs, "src0", "src1").collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getDouble(2), out.getLong(3)) ==
      ((2L, 2L, 0.5, 1L)), out.toString)
  }

  test("ksDrift: an absent source yields NULL witnesses, never a 0/0 NaN") {
    val docs = Seq(("src0", 1L), ("src0", 2L)).toDF("source", "n_chars")
    val out = DataQuality.ksDrift(docs, "src0", "srcMISSING").collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 0L, out.toString)
    assert(out.isNullAt(2) && out.isNullAt(3), out.toString)
  }

  test("welchT: a single-row group yields NULL statistics, never Infinity") {
    import spark.implicits._
    val df = Seq(("click", 1.0), ("click", 2.0), ("purchase", 5.0)).toDF("event_type", "value")
    val r = DataQuality.welchT(df, "event_type", "value", "click", "purchase")
      .collect().head
    assert(r.getAs[Long]("n_b") == 1L)
    assert(r.isNullAt(r.fieldIndex("t_stat")) && r.isNullAt(r.fieldIndex("dof")), r.toString)
  }

  test("theilSenDaily: median pairwise slope on hand values; single-day type gets a NULL witness") {
    import spark.implicits._
    def rows(typ: String, dayCounts: (String, Int)*) =
      dayCounts.flatMap { case (d, n) => (1 to n).map(i =>
        (s"$typ$d$i", s"2024-01-0$d 10:0$i:00", 1L, typ, 1.0)) }
    // type a: counts 1,3,2 on days 1,2,3 → slopes {2, 0.5, -1} → median 0.5
    // type b: one active day → no pairs, NULL slope
    val ev = (rows("a", ("1", 1), ("2", 3), ("3", 2)) ++ rows("b", ("5", 2)))
      .zipWithIndex.map { case ((_, ts, u, t, v), i) => (i.toLong, ts, u, t, v) }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .selectExpr("event_id", "cast(ts_s as timestamp) as ts", "user_id",
        "event_type", "value")
    val out = DataQuality.theilSenDaily(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(out("a") == ((3L, 3L, 0.5)), out.toString)
    assert(out("b") == ((1L, 0L, null)), out.toString)
  }

  test("mannKendallDaily: hand S/Var/z on mixed data; strict ramp maxes S; all-tied series reports NULL z") {
    import spark.implicits._
    def rows(typ: String, dayCounts: (String, Int)*) =
      dayCounts.flatMap { case (d, n) => (1 to n).map(i =>
        (s"$typ$d$i", s"2024-01-0$d 10:0$i:00", 1L, typ, 1.0)) }
    // type a: counts 1,3,2,3 on days 1..4 — S = sgn-pairs:
    // (1,3)+ (1,2)+ (1,3)+ (3,2)- (3,3)0 (2,3)+ → S = 3;
    // ties: value 3 twice → tt = 2·1·9 = 18; Var = (4·3·13 − 18)/18 = 138/18
    // type b: strict ramp 1,2,3 → S = 3, no ties, Var = 3·2·11/18
    // type c: all-tied 2,2 → S = 0, Var = 0 → NULL z
    val ev = (rows("a", ("1", 1), ("2", 3), ("3", 2), ("4", 3)) ++
      rows("b", ("1", 1), ("2", 2), ("3", 3)) ++ rows("c", ("1", 2), ("2", 2)))
      .zipWithIndex.map { case ((_, ts, u, t, v), i) => (i.toLong, ts, u, t, v) }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .selectExpr("event_id", "cast(ts_s as timestamp) as ts", "user_id",
        "event_type", "value")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = DataQuality.mannKendallDaily(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(out("a") == ((4L, 3L, r6(138.0 / 18.0), r6(2.0 / math.sqrt(138.0 / 18.0)))),
      out.toString)
    assert(out("b") == ((3L, 3L, r6(66.0 / 18.0), r6(2.0 / math.sqrt(66.0 / 18.0)))),
      out.toString)
    assert(out("c") == ((2L, 0L, 0.0, null)), out.toString)
  }

  test("psiDrift: identical distribution reads exactly 0; total displacement reads the closed form") {
    import spark.implicits._
    // ref A = 1..10 → decile boundaries are exactly 1..9 (rank k at
    // value k); B identical → every share pair equal → psi = 0 exactly
    // (ln 1 = 0 before any rounding); C all-mass-in-bucket-10:
    // 9 buckets at (0.05−0.1)·ln(0.5) → 0.034657 each (6dp), bucket 10
    // at (0.55−0.1)·ln(5.5) → 0.767137 → psi = 1.07905
    val docs = (
      (1 to 10).map(i => (i.toLong, "A", i.toLong)) ++
      (1 to 10).map(i => (100L + i, "B", i.toLong)) ++
      (1 to 10).map(i => (200L + i, "C", 100L))
    ).toDF("doc_id", "source", "n_chars")
    val out = DataQuality.psiDrift(docs, refSource = "A")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set("B", "C"), out.toString)
    assert(out("B") == ((10L, 0.0)), out.toString)
    assert(out("C") == ((10L, 1.07905)), out.toString)
  }

  test("woeIv: hand values with integer Laplace smoothing; IV is the decimal term sum") {
    // bucket 1: 3 returned / 1 kept; bucket 2: 1 / 3. G=4, B=4, K=2.
    // woe1 = ln((3+1)(4+2) / (1+1)(4+2)) = ln 2 = 0.693147
    // term = (4/6 - 2/6) * 0.693147 = 0.231049 each -> iv = 0.462098
    val li = (Seq.fill(3)(("R", 0.01)) ++ Seq(("N", 0.01)) ++
      Seq(("R", 0.02)) ++ Seq.fill(3)(("N", 0.02)))
      .toDF("l_returnflag", "l_discount")
    val out = DataQuality.woeIv(li).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1) == ((4L, 3L, 1L, 0.693147, 0.462098)), out.toString)
    assert(out(2) == ((4L, 1L, 3L, -0.693147, 0.462098)), out.toString)
  }

  test("mannWhitney: hand U and tie-corrected z; ties share average ranks exactly") {
    // A={3,4}, B={1,2}, no ties: U_A = 4 (max), z = 4/(2*sqrt(240/144))
    val df = Seq(("1-URGENT", 0.03), ("1-URGENT", 0.04), ("5-LOW", 0.01), ("5-LOW", 0.02))
      .toDF("o_orderpriority", "o_totalprice")
    val r = DataQuality.mannWhitney(df).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 4.0, r.toString)
    assert(r.getDouble(3) == 1.549193, r.toString)
    // tied case: A={1,3}, B={2,2}: R_A = 1 + 4 = 5, U_A = 2 = mu -> z = 0
    val df2 = Seq(("1-URGENT", 0.01), ("1-URGENT", 0.03), ("5-LOW", 0.02), ("5-LOW", 0.02))
      .toDF("o_orderpriority", "o_totalprice")
    val r2 = DataQuality.mannWhitney(df2).collect()(0)
    assert(r2.getDouble(2) == 2.0 && r2.getDouble(3) == 0.0, r2.toString)
  }

  test("kendallDaily: hand tau-b with ties; all-tied axis reports NULL") {
    import spark.implicits._
    def ev(id: Long, day: String, typ: String, n: Int, v: Double) =
      (1 to n).map(i => (id * 100 + i, s"2024-01-$day ${10 + i}:00:00", 1L, typ, v))
    // type "a", 4 days: counts (1,2,3,4), value mass = one event/day would
    // tie; use per-day event counts 1,2,2,3 and values s.t. v = (10,20,20,5):
    // pairs (6): c-order vs v-order -> nc: (d1,d2)+, (d1,d3)+, (d1,d4)? c 1<3, v 10>5 -> discordant
    //   (d2,d3): c tie; (d2,d4): c 2<3, v 20>5 -> nd; (d3,d4): nd
    // nc=2 nd=3 tx=1 ty=1 n0=6 -> tau = (2-3)/sqrt(25) = -0.2
    val rows =
      ev(1, "01", "a", 1, 10.0) ++ ev(2, "02", "a", 2, 10.0) ++
      ev(3, "03", "a", 2, 10.0) ++ ev(4, "04", "a", 3, 5.0 / 3) ++
      // type "b": constant count 1 across 3 days -> count axis all ties -> NULL
      ev(5, "01", "b", 1, 1.0) ++ ev(6, "02", "b", 1, 2.0) ++ ev(7, "03", "b", 1, 3.0)
    val df = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .selectExpr("event_id", "cast(ts_s as timestamp) as ts", "user_id", "event_type", "value")
    val out = DataQuality.kendallDaily(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 2L && a.getLong(3) == 3L, a.toString)
    assert(a.getDouble(4) == -0.2, a.toString)
    assert(out("b").isNullAt(4), out("b").toString)
  }

  test("fdCheck: held key FD, violated FD with quantified fan-out, null-safe distinct") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"), (4L, "b", "z"))
      .toDF("id", "g", "v")
    val out = DataQuality.fdCheck(df, Seq(("id", "g"), ("g", "v")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(("id", "g")) == ((4L, 0L, 1L, true)), out.toString)
    // g=a fans out to {x,y}; g=b maps to one value
    assert(out(("g", "v")) == ((2L, 1L, 2L, false)), out.toString)
  }

  test("jsDivergence: identical corpora read 0; disjoint vocabularies read ln 2; floor renormalizes") {
    import spark.implicits._
    def docs(rows: (String, String)*) = rows.zipWithIndex
      .map { case ((src, text), i) => (i.toLong, src, text) }
      .toDF("doc_id", "source", "text")
    // identical token distributions on both sides -> every p == q -> 0
    val same = docs(
      ("src0", "alpha beta gamma alpha beta"), ("src0", "alpha beta gamma alpha beta"),
      ("other", "alpha beta gamma alpha beta"), ("other", "alpha beta gamma alpha beta"))
    val r0 = DataQuality.jsDivergence(same, "src0", minCount = 2).collect()(0)
    assert(r0.getDouble(5) == 0.0 && r0.getDouble(3) == 0.0 && r0.getDouble(4) == 0.0, r0.toString)
    // fully disjoint vocabularies -> JSD = ln 2 (each side's KL(P||M) = ln 2)
    val disj = docs(
      ("src0", "aa aa aa aa aa bb bb bb bb bb"),
      ("other", "cc cc cc cc cc dd dd dd dd dd"))
    val r1 = DataQuality.jsDivergence(disj, "src0", minCount = 2).collect()(0)
    assert(math.abs(r1.getDouble(5) - math.log(2.0)) < 1e-5, r1.toString)
    assert(r1.getLong(0) == 4L, "all four types pass the floor: " + r1)
    // the vocabulary floor drops rare types and renormalizes totals
    val floored = docs(
      ("src0", "aa aa aa aa rare"), ("other", "aa aa aa aa other_rare"))
    val r2 = DataQuality.jsDivergence(floored, "src0", minCount = 5).collect()(0)
    assert(r2.getLong(0) == 1L && r2.getLong(1) == 4L && r2.getLong(2) == 4L,
      "only 'aa' (combined 8) survives; totals renormalize: " + r2)
    assert(r2.getDouble(5) == 0.0, r2.toString)
  }

  test("tClosenessViolations: hand-computed variational distance, absent-value term, strict threshold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // global marginal: a 4/8, b 2/8, c 2/8
    // group A (a,a,a,b): D = .5*(|3/4-1/2| + |1/4-1/4| + |0-1/4|) = 0.25
    //   — 'c' is absent from A, so the absent-value closed-form term carries 1/4
    // group B (a,b,c,c): D = .5*(|1/4-1/2| + 0 + |1/2-1/4|) = 0.25
    val df = Seq(("A", "a"), ("A", "a"), ("A", "a"), ("A", "b"),
      ("B", "a"), ("B", "b"), ("B", "c"), ("B", "c")).toDF("g", "sv")
    val out = DataQuality.tClosenessViolations(df, Seq(col("g")), col("sv"), t = 0.2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map("A" -> ((4L, 0.25)), "B" -> ((4L, 0.25))), out.toString)
    // the threshold is strict: groups AT t are compliant
    assert(DataQuality.tClosenessViolations(df, Seq(col("g")), col("sv"), t = 0.25)
      .isEmpty, "D == t must not violate")
    // a group matching the marginal exactly reads 0 and never violates
    val uniform = Seq(("A", "a"), ("A", "b"), ("B", "a"), ("B", "b")).toDF("g", "sv")
    assert(DataQuality.tClosenessViolations(uniform, Seq(col("g")), col("sv"), t = 0.01)
      .isEmpty, "groups identical to the marginal are 0-distance")
  }
}
