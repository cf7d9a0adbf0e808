package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the distributive-aggregate merge: the merge of
  * two partition aggregates must equal the direct aggregation of the
  * union (the MV-maintenance law), and columns that don't declare a
  * mergeable algebra must fail fast instead of merging wrongly.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(
      count(lit(1)).as("cnt"),
      sum(col("v").cast("decimal(18,4)")).as("sum_v"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))

  test("merge of partition aggregates equals the direct aggregation") {
    val rows = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", 4.0), ("b", -1.0), ("c", 7.0))
    val df = rows.toDF("k", "v")
    // deterministic split: first 3 rows vs last 3
    val p1 = aggOf(rows.take(3).toDF("k", "v"))
    val p2 = aggOf(rows.drop(3).toDF("k", "v"))
    val merged = Relational.mergeDistributive(p1, p2, Seq("k"))
    assert(rowSet(merged) == rowSet(aggOf(df)), s"merged=${rowSet(merged)}")
    // a key present in only one partition survives untouched
    assert(merged.filter(col("k") === "c").count() == 1)
  }

  test("a column without a declared algebra fails fast") {
    val a = Seq(("a", 1.0)).toDF("k", "v").groupBy("k").agg(avg("v").as("avg_v"))
    val e = intercept[IllegalArgumentException] {
      Relational.mergeDistributive(a, a, Seq("k"))
    }
    assert(e.getMessage.contains("avg_v"))
  }

  test("exactNtile: NTILE definition — first n mod b buckets take the extra row") {
    // 7 rows, 3 buckets: base=2, rem=1 → sizes 3,2,2 in rank order
    val df = Seq((10, "a"), (20, "b"), (30, "c"), (40, "d"), (50, "e"), (60, "f"), (70, "g"))
      .toDF("v", "id")
    val out = Relational.exactNtile(df, 3, Seq("v", "id"), "bucket")
    val got = out.select(col("id"), col("bucket")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "e" -> 2L, "f" -> 3L, "g" -> 3L))
  }

  test("exactNtile: n < buckets degenerates to rank; reserved-column collision fails fast") {
    val df = Seq((5, "x"), (1, "y")).toDF("v", "id")
    val out = Relational.exactNtile(df, 5, Seq("v", "id"), "b")
    assert(rowSet(out.select(col("id"), col("b"))) == Set("1|y", "2|x"))
    val e = intercept[IllegalArgumentException] {
      Relational.exactNtile(df.withColumn("b", lit(0)), 5, Seq("v"), "b")
    }
    assert(e.getMessage.contains("'b'"))
  }

  test("bitmapDistinct: exact distinct counts and word occupancy across the 32-bit boundary") {
    val df = Seq(("a", 0L), ("a", 1L), ("a", 31L), ("a", 31L), ("a", 32L),
      ("b", 64L), ("b", 64L)).toDF("g", "uid")
    val out = Relational.bitmapDistinct(df, "g", "uid")
    // group a: ids {0,1,31} share word 0, {32} is word 1 → 2 words, 4 distinct
    assert(rowSet(out) == Set("a|4|2", "b|1|1"))
  }

  test("calendarFillDaily: interior gap days materialize as explicit zero rows") {
    val orders = Seq(
      (1L, "2024-01-01", "1-URGENT", 10.50),
      (2L, "2024-01-04", "1-URGENT", 4.25),
      (3L, "2024-01-04", "2-HIGH", 1.00))
      .toDF("o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    val out = Relational.calendarFillDaily(orders)
    // spine = 4 days × 2 priorities = 8 rows, 3 observed + 5 zero-filled
    assert(out.count() == 8)
    assert(out.filter(col("n_orders") === 0 && col("revenue") === 0.0).count() == 5)
    assert(rowSet(out.filter(col("day") === "2024-01-04")) ==
      Set("2024-01-04|1|1-URGENT|4.25", "2024-01-04|1|2-HIGH|1.0"))
  }

  test("ltvCohort: offsets are exact month diffs; cumulative revenue runs within cohort") {
    val orders = Seq(
      (1L, "2024-01-15", "x", 10.0), (1L, "2024-03-02", "x", 20.0),
      (2L, "2024-03-20", "x", 5.0))
      .toDF("o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    val out = Relational.ltvCohort(orders)
    // cols sorted: cohort_month|cum_revenue|month_offset|n_active|revenue
    assert(rowSet(out) == Set(
      "2024-01|10.0|0|1|10.0", "2024-01|30.0|2|1|20.0", "2024-03|5.0|0|1|5.0"))
  }

  test("prefixSum: exact running sum in range order; reserved-column collision fails fast") {
    val df = Seq((3L, "a", 5L), (1L, "b", -2L), (2L, "c", 10L)).toDF("t", "id", "v")
    val out = Relational.prefixSum(df, Seq(col("t")), "v", "run")
    val got = out.select(col("id"), col("run")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("b" -> -2L, "c" -> 8L, "a" -> 13L), got.toString)
    val e = intercept[IllegalArgumentException] {
      Relational.prefixSum(df.withColumn("run", lit(0L)), Seq(col("t")), "v", "run")
    }
    assert(e.getMessage.contains("'run'"))
  }

  test("abcClassification: integer-cents cuts land exactly on the 80/95 boundaries") {
    // revenues 80.00 / 15.00 / 5.00 → cum shares 0.80, 0.95, 1.00:
    // both boundary parts must still be A and B (<=, not <)
    val li = Seq((1L, 80.0, 0.0), (2L, 15.0, 0.0), (3L, 5.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Relational.abcClassification(li)
    // cols sorted: abc_class|n_parts|revenue|share
    assert(rowSet(out) == Set("A|1|80.0|0.8", "B|1|15.0|0.15", "C|1|5.0|0.05"),
      rowSet(out).toString)
  }

  test("interOrderGapProfile: rank statistics off the integer-day frequency grid") {
    // cust 1 orders day 1,3,10 → gaps 2,7; cust 2 orders day 1,2 → gap 1
    // gaps {1,2,7}: mean 10/3, median 2.0, p90 = value at rank ceil(2.7)=3 → 7
    val orders = Seq(
      (1L, 101L, "2024-01-01"), (1L, 102L, "2024-01-03"), (1L, 103L, "2024-01-10"),
      (2L, 201L, "2024-01-01"), (2L, 202L, "2024-01-02"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val out = Relational.interOrderGapProfile(orders).collect()(0)
    assert(out.getLong(0) == 3L, out.toString)
    assert(out.getDouble(1) == 3.333333, out.toString)
    assert(out.getDouble(2) == 2.0, out.toString)
    assert(out.getInt(3) == 7, out.toString)
  }

  test("kmSurvival: at-risk includes the censored; scaled-integer product matches the hand curve") {
    // durations: t=5 censored (last == dmax), t=10 with 2 churns, t=20 with 1
    // risks: t10 → 3 (censored t5 already left), t20 → 1
    // S(10) = 1/3 → s9 = 333333333; S(20) = 0
    val orders = Seq(
      (1L, 101L, "2024-01-01"), (1L, 102L, "2024-01-11"),
      (2L, 201L, "2024-01-01"), (2L, 202L, "2024-01-11"),
      (3L, 301L, "2024-01-01"), (3L, 302L, "2024-01-21"),
      (4L, 401L, "2024-02-25"), (4L, 402L, "2024-03-01"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val out = Relational.kmSurvival(orders, censorDays = 30)
    // cols sorted: duration_days|n_events|n_risk|survival
    assert(rowSet(out) == Set("10|2|3|0.333333", "20|1|1|0.0"), rowSet(out).toString)
  }

  test("bootstrapCiPoisson: round-robin spread only when the source is under-split") {
    // shuffle.partitions is 4 in the test session: a 32-split source
    // must NOT pay the data-sized exchange; a 1-split source must
    def src(slices: Int) = spark.range(0, 200, 1, slices)
      .selectExpr("id as o_orderkey", "cast(id as double) / 7 as o_totalprice")
    val wide = Relational.bootstrapCiPoisson(src(32), b = 8)
      .queryExecution.executedPlan.toString
    assert(!wide.contains("RoundRobinPartitioning"),
      "a multi-split source must not be re-shuffled:\n" + wide)
    val narrow = Relational.bootstrapCiPoisson(src(1), b = 8)
      .queryExecution.executedPlan.toString
    assert(narrow.contains("RoundRobinPartitioning"),
      "a single-split source must spread across cores:\n" + narrow)
    // and the gate changes no values
    assert(rowSet(Relational.bootstrapCiPoisson(src(32), b = 8)) ==
      rowSet(Relational.bootstrapCiPoisson(src(1), b = 8)))
  }

  test("bloomPrunedJoin: exactly the plain join (no false negatives); handle destroy is clean") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (1L, "e"))
      .toDF("k", "payload")
    val small = Seq((1L, "x"), (3L, "y"), (9L, "z")).toDF("sk", "tag")
    val (joined, handle) = Relational.bloomPrunedJoinWithHandle(big, small, "k", "sk")
    val plain = big.join(small, col("k") === col("sk"))
    assert(rowSet(joined) == rowSet(plain) && joined.count() == 3)
    handle.destroy() // explicit lifecycle — must not have been destroyed already
  }

  test("joinDeltaRows: the three delta terms reconstruct the full join exactly") {
    val aOld = Seq((1L, "o1"), (2L, "o2")).toDF("ak", "a")
    val aNew = Seq((1L, "n1"), (3L, "n3")).toDF("ak", "a")
    val bOld = Seq((1L, "x"), (3L, "y")).toDF("bk", "b")
    val bNew = Seq((2L, "z")).toDF("bk", "b")
    // ΔA⋈B0: (1,n1,x),(3,n3,y); A0⋈ΔB: (2,o2,z); ΔA⋈ΔB: none here
    val v0 = aOld.join(bOld, col("ak") === col("bk"))
    val maintained = v0.unionByName(
      Relational.joinDeltaRows(aOld, aNew, bOld, bNew, "ak", "bk"))
    val direct = aOld.unionByName(aNew).join(bOld.unionByName(bNew),
      col("ak") === col("bk"))
    assert(rowSet(maintained) == rowSet(direct) && maintained.count() == 4)
  }

  test("prefixMax: running high-water mark across range partitions; collision fails fast") {
    val df = Seq((1L, 50L), (2L, 90L), (3L, 40L), (4L, 100L), (5L, 70L)).toDF("t", "v")
    val out = Relational.prefixMax(df, Seq(col("t")), "v", "hwm")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 50L, 2L -> 90L, 3L -> 90L, 4L -> 100L, 5L -> 100L), got.toString)
    val e = intercept[IllegalArgumentException] {
      Relational.prefixMax(df.withColumn("hwm", lit(0L)), Seq(col("t")), "v", "hwm")
    }
    assert(e.getMessage.contains("'hwm'"))
  }

  test("segmentCi: exact-moment CI matches the hand value; a singleton segment reports NULL bounds") {
    // A: 100.00 and 200.00 → mean 150, s/sqrt(2) = 5000 cents exactly →
    // half-width 1.96*5000/100 = 98.0 → CI [52, 248]
    val orders = Seq(("A", 100.0), ("A", 200.0), ("B", 42.0))
      .toDF("o_orderpriority", "o_totalprice")
    val out = Relational.segmentCi(orders)
    // cols sorted: ci_hi|ci_lo|mean|n|o_orderpriority
    assert(rowSet(out) == Set("248.0|52.0|150.0|2|A", "NULL|NULL|42.0|1|B"),
      rowSet(out).toString)
  }

  test("priceDecileMix: the exactNtile cut drives the revenue rollup; unsold parts don't appear") {
    val part = (1L to 10L).map(i => (i, i * 1.0)).toDF("p_partkey", "p_retailprice")
    val li = Seq((1L, 10.0), (1L, 20.0), (10L, 100.0)) // deciles 1 and 10 sold
      .toDF("l_partkey", "l_extendedprice")
    val out = Relational.priceDecileMix(li, part)
    // cols sorted: n_lines|n_parts|price_decile|revenue
    assert(rowSet(out) == Set("2|1|1|30.0", "1|1|10|100.0"), rowSet(out).toString)
  }

  test("globalRank: 1-based total-order ranks across range partitions") {
    val df = Seq((30L, "a"), (10L, "b"), (20L, "c"), (10L, "d")).toDF("v", "id")
    val out = Relational.globalRank(df, Seq(col("v"), col("id")), "r")
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(out == Map("b" -> 1L, "d" -> 2L, "c" -> 3L, "a" -> 4L), out.toString)
  }

  test("giniRevenue: hand values — perfect equality is 0, concentration approaches (n-1)/n") {
    // equal revenues x,x: G = 2(1x+2x)/(2*2x) - 3/2 = 3/2 - 3/2 = 0
    val eq = Seq((1L, "1995-01-01", 100.0), (2L, "1995-01-01", 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val g0 = Relational.giniRevenue(eq).collect()(0)
    assert(g0.getLong(0) == 2L && g0.getDouble(2) == 0.0, g0.toString)
    // one customer has everything meaningful: 3 custs, cents 0.01,0.01,10000.00
    // G = 2(1·1+2·1+3·1000000)/(3·1000002) − 4/3 ≈ 0.666664
    val sk = Seq((1L, "1995-01-01", 0.01), (2L, "1995-01-01", 0.01),
      (3L, "1995-01-01", 10000.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val g1 = Relational.giniRevenue(sk).collect()(0)
    assert(g1.getDouble(2) > 0.66 && g1.getDouble(2) < 0.667, g1.toString)
  }

  test("theilRevenue: equality is exactly 0; near-total concentration approaches ln(n)") {
    val eq = Seq((1L, "1995-01-01", 100.0), (2L, "1995-01-01", 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val t0 = Relational.theilRevenue(eq).collect()(0)
    // r = 1 exactly (cents·n/s is an exact double divide) → ln 1 = 0
    assert(t0.getLong(0) == 2L && t0.getDouble(1) == 0.0 && t0.getDouble(2) == 0.0,
      t0.toString)
    // cents (1, 1, 1000000): T ≈ 1.0986 → theil_norm ≈ 1 (max is ln 3)
    val sk = Seq((1L, "1995-01-01", 0.01), (2L, "1995-01-01", 0.01),
      (3L, "1995-01-01", 10000.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val t1 = Relational.theilRevenue(sk).collect()(0)
    assert(t1.getDouble(1) > 1.09 && t1.getDouble(1) < math.log(3.0), t1.toString)
    assert(t1.getDouble(2) > 0.999 && t1.getDouble(2) <= 1.0, t1.toString)
    // a zero-revenue customer is excluded, not a NaN
    val z = Seq((1L, "1995-01-01", 0.0), (2L, "1995-01-01", 50.0),
      (3L, "1995-01-01", 50.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val t2 = Relational.theilRevenue(z).collect()(0)
    assert(t2.getLong(0) == 2L && t2.getDouble(1) == 0.0, t2.toString)
  }

  test("decileMigration: decile 0 marks absence; diagonal and churn cells by hand") {
    // 2 buckets: year A actives {1:$100, 2:$200, 3:$300}; year B {2:$50, 3:$400, 4:$10}
    val orders = Seq(
      (1L, "1996-03-01", 100.0), (2L, "1996-03-01", 200.0), (3L, "1996-03-01", 300.0),
      (2L, "1997-03-01", 50.0), (3L, "1997-03-01", 400.0), (4L, "1997-03-01", 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.decileMigration(orders, 1996, 1997, nBuckets = 2)
    // A deciles (n=3, 2 buckets → bucket1 gets 2): 1→1, 2→1, 3→2
    // B deciles: 4($10)→1, 2($50)→1, 3($400)→2
    // cells: (1,0) cust1 churned; (1,1) cust2; (2,2) cust3; (0,1) cust4 new
    assert(rowSet(out) == Set(
      "1|0|1|100.0|0.0", "1|1|1|200.0|50.0", "2|2|1|300.0|400.0", "0|1|1|0.0|10.0"),
      rowSet(out).toString)
  }

  test("hhiConcentration: monopoly → 1.0, perfect equality → 1/n; floor column matches") {
    val orders = Seq(
      (1L, "1996-01-01", 500.0),                              // nation 10: monopoly
      (2L, "1996-01-01", 100.0), (3L, "1996-01-01", 100.0),
      (4L, "1996-01-01", 100.0), (5L, "1996-01-01", 100.0))   // nation 20: 4 equals
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, 10), (2L, 20), (3L, 20), (4L, 20), (5L, 20))
      .toDF("c_custkey", "c_nationkey")
    val out = Relational.hhiConcentration(orders, cust).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(10).getDouble(3) == 1.0 && out(10).getDouble(4) == 1.0)
    assert(out(20).getDouble(3) == 0.25 && out(20).getDouble(4) == 0.25)
    assert(out(20).getLong(1) == 4L && out(20).getDouble(2) == 400.0)
  }

  test("rfmSegments: quintile orientation (1 = most recent / least frequent / least value)") {
    val orders = Seq(
      (1L, "2024-01-10", 100.0), (1L, "2024-01-10", 100.0),
      (2L, "2024-01-01", 500.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rfmSegments(orders)
    // cust1: rec=0 freq=2 $200 → (r,f,m)=(1,2,1); cust2: rec=9 freq=1 $500 → (2,1,2)
    assert(rowSet(out) == Set("2|1|1|1|200.0", "1|2|1|2|500.0"))
  }

  test("groupedPercentRank == PERCENT_RANK window semantics: ties share min rank, singleton = 0") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0),
      ("b", 5.0), ("b", 7.0), ("c", 99.0)).toDF("g", "v")
    val fast = Relational.groupedPercentRank(df, "g", "v", "pr")
    val ref = df.withColumn("pr",
      percent_rank().over(Window.partitionBy(col("g")).orderBy(col("v"))))
    assert(rowSet(fast) == rowSet(ref), s"fast=${rowSet(fast)} ref=${rowSet(ref)}")
    // hand values: a's ties at 20.0 share rank 2 -> (2-1)/3; c singleton -> 0
    val m = fast.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toSet
    assert(m.contains(("a", 20.0) -> (1.0 / 3)) && m.contains(("c", 99.0) -> 0.0), m.toString)
  }

  test("groupedPercentRank keeps NULL group and NULL value rows (null-safe join back)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((Some("a"), Some(10.0)), (Some("a"), None), (Some("a"), Some(20.0)),
      (None, Some(1.0)), (None, Some(2.0)), (Some("b"), None), (Some("b"), None))
      .toDF("g", "v")
    val fast = Relational.groupedPercentRank(df, "g", "v", "pr")
    assert(fast.count() == df.count(), "null-keyed rows must survive the join back")
    // matches the window it replaces: nulls rank first (asc_nulls_first)
    val ref = df.withColumn("pr",
      percent_rank().over(Window.partitionBy(col("g")).orderBy(col("v"))))
    assert(rowSet(fast) == rowSet(ref), s"fast=${rowSet(fast)} ref=${rowSet(ref)}")
  }

  test("theilDecomposition: additive identity vs theilRevenue; equal-within-group nations read 0") {
    val orders = Seq(
      (1L, "1995-01-01", 10.0), (2L, "1995-01-01", 10.0),   // nation 1: equal -> within 0
      (3L, "1995-01-01", 1.0), (4L, "1995-01-01", 99.0))    // nation 2: skewed
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2)).toDF("c_custkey", "c_nationkey")
    val parts = Relational.theilDecomposition(orders, cust).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(parts(1)._3 == 0.0, parts.toString) // equal incomes -> zero within-Theil
    assert(parts(1)._1 == 2L && parts(2)._1 == 2L)
    val total = Relational.theilRevenue(orders).collect()(0).getDouble(1)
    val recomposed = parts.values.map(p => p._2 * p._3).sum + parts.values.map(_._4).sum
    assert(math.abs(recomposed - total) < 1e-4,
      s"decomposition $recomposed != total $total")
    // shares sum to 1
    assert(math.abs(parts.values.map(_._2).sum - 1.0) < 1e-6)
  }
}
