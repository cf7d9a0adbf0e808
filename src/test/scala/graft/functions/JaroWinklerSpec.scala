package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** JaroWinkler kernel: known literature values, the DuckDB-pinned
  * corners (both-empty → 0), metric properties under fuzz against an
  * independently-written reference, and codegen-path execution. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    org.apache.spark.sql.graftext.GraftKernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("literature values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    // transposed halves share no in-window matches at length 2
    assert(jw("ab", "ba") == 0.0)
    // no boost below the 0.7 threshold: CRATE/TRACE jaro = 0.7333...,
    // shares no prefix anyway; AT/TA-style full mismatch already covered
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
  }

  test("DuckDB-pinned corners: empty sides and identity") {
    assert(jw("", "") == 0.0)   // DuckDB: empty is 0 even vs empty
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("x", "y") == 0.0) // window -1: two 1-char strings never match
    assert(jw("x", "x") == 1.0)
  }

  /** Independent reference: textbook Jaro + Winkler boost, written
    * against Winkler (1990) rather than by reading the kernel. */
  private def refJw(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val win = math.max(l1, l2) / 2 - 1
    val used = Array.fill(l2)(false)
    val matched1 = new scala.collection.mutable.ArrayBuffer[Char]
    val matched2Idx = new scala.collection.mutable.ArrayBuffer[Int]
    for (i <- 0 until l1) {
      var j = math.max(0, i - win)
      var hit = -1
      while (j < math.min(i + win + 1, l2) && hit < 0) {
        if (!used(j) && s1(i) == s2(j)) hit = j
        j += 1
      }
      if (hit >= 0) { used(hit) = true; matched1 += s1(i); matched2Idx += hit }
    }
    val m = matched1.size
    if (m == 0) return 0.0
    val matched2 = matched2Idx.sorted.map(s2(_))
    val t = matched1.zip(matched2).count { case (a, b) => a != b } / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val p = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.size
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  test("fuzz vs independent reference; symmetry; range") {
    val rnd = new Random(20260815L)
    for (_ <- 1 to 4000) {
      val a = Seq.fill(rnd.nextInt(14))("abcdef xyz".charAt(rnd.nextInt(10))).mkString
      val b = Seq.fill(rnd.nextInt(14))("abcdef xyz".charAt(rnd.nextInt(10))).mkString
      val v = jw(a, b)
      assert(v == refJw(a, b), s"kernel vs reference on ('$a','$b')")
      assert(v == jw(b, a), s"symmetry on ('$a','$b')")
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("DataFrame path (codegen) matches the kernel; nulls propagate") {
    val df = Seq(("MARTHA", "MARHTA"), ("", ""), ("abc", "abc"), (null, "x"))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.jaroWinkler(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).getDouble(0) == 1.0)
    assert(out(3).isNullAt(0))
    // SQL registration surface
    graft.functions.VectorFunctions.register(spark)
    val sql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").head().getDouble(0)
    assert(math.abs(sql - 0.9611111111111111) < 1e-15)
  }

  test("jaroRepMatch: exact duplicates collapse to (min-id rep, count) before scoring") {
    val df = Seq(
      (5L, "B1", "goldenrod lace"), (2L, "B1", "goldenrod lace"),   // dup group, rep=2
      (3L, "B1", "goldenrod lamp"), (9L, "B2", "goldenrod lace"))
      .toDF("id", "brand", "name")
    val out = graft.ops.FuzzyJoin
      .jaroRepMatch(df, "id", "name", Seq(col("brand")), threshold = 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one rep pair: (2 ["goldenrod lace" x2], 3 ["goldenrod lamp" x1]);
    // no self-pair for the dup group; 9 is blocked away
    assert(out.toSeq == Seq((2L, 3L, 2L, 1L)), out.mkString(","))
  }

  test("jaroErClusters == connected components of the raw full pair graph") {
    val df = Seq(
      (1L, "B1", "goldenrod lace"), (7L, "B1", "goldenrod lace"),   // exact dups
      (2L, "B1", "goldenrod lamp"),                                  // fuzzy link to the dups
      (4L, "B1", "zzz unrelated name"),                              // matches nothing
      (5L, "B2", "silver spring"), (6L, "B2", "silver spring"))      // exact-only cluster
      .toDF("id", "brand", "name")
    val fast = graft.ops.FuzzyJoin
      .jaroErClusters(df, "id", "name", Seq(col("brand")), threshold = 0.85)
    // reference: raw quadratic pair graph -> CC
    val raw = graft.ops.FuzzyJoin
      .jaroBlockedJoin(df, "id", "name", Seq(col("brand")), threshold = 0.85)
    val cc = graft.dedup.Dedup.dedupClusters(raw.select(col("id1"), col("id2")))
      .select(col("doc_id").as("id"), col("cluster_id"))
    val ccSized = cc.join(
      cc.groupBy("cluster_id").agg(count(lit(1)).cast("long").as("n_members")),
      "cluster_id").select(col("id"), col("cluster_id"), col("n_members"))
    assert(rowSet(fast) == rowSet(ccSized),
      s"fast=${rowSet(fast)} raw=${rowSet(ccSized)}")
    // and the expected shape: {1,7,2} under rep 1; {5,6} under 5; 4 absent
    // rowSet orders columns alphabetically: cluster_id|id|n_members
    assert(rowSet(fast) == Set("1|1|3", "1|2|3", "1|7|3", "5|5|2", "5|6|2"),
      rowSet(fast).toString)
  }

  test("blocked self-match join: exhaustive in-block pairs, threshold cut") {
    val df = Seq(
      (1L, "B1", "goldenrod lace"), (2L, "B1", "goldenrod lavender"),
      (3L, "B1", "golden lace"), (4L, "B2", "goldenrod lace"),
      (5L, "B1", "zzz entirely other")).toDF("id", "brand", "name")
    val out = graft.ops.FuzzyJoin
      .jaroBlockedJoin(df, "id", "name", Seq(col("brand")), threshold = 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // in-brand B1 pairs above 0.85; id 4 is blocked away despite an exact
    // name match with id 1; id 5 matches nothing
    assert(out.contains((1L, 2L)) && out.contains((1L, 3L)) && out.contains((2L, 3L)))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
  }
}
