package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FuzzyJoin: the SymSpell delete-neighborhood edit-distance join must
  * find exactly the pairs the quadratic levenshtein theta join finds —
  * completeness (no true pair missed by the blocking) and precision (no
  * over-generated candidate survives the verify) — without ever planning
  * a cartesian product.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val leftToks =
    Seq("table", "tble", "tabel", "zzz", "abcab", "ab").toDF("tok_a")
  private val rightToks =
    Seq("table", "cable", "cabxy", "ba").toDF("tok_b")

  test("delete neighborhood: exact sets at depth 1 and 2") {
    val row = Seq("abc").toDF("t")
      .select(FuzzyJoin.deleteNeighborhood(col("t"), 1).as("d1"),
        FuzzyJoin.deleteNeighborhood(col("t"), 2).as("d2"))
      .collect()(0)
    assert(row.getSeq[String](0).toSet == Set("abc", "bc", "ac", "ab"))
    assert(row.getSeq[String](1).toSet ==
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("matches the quadratic theta join exactly (maxDist 1 and 2)") {
    for (k <- Seq(1, 2)) {
      val got = FuzzyJoin.fuzzyJoin(leftToks, rightToks, "tok_a", "tok_b", k)
        .select("tok_a", "tok_b", "dist")
      val want = leftToks.crossJoin(rightToks)
        .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")))
        .filter(col("dist") <= k)
      assert(rowSet(got) == rowSet(want), s"maxDist=$k")
    }
  }

  test("over-generated candidate (shared variant, dist 4) is verified away") {
    // "abcab" and "cabxy" share the depth-2 delete variant "cab" but sit
    // at levenshtein 4 — the equi-join proposes them, the verify drops them.
    val shared = Seq(("abcab", "cabxy")).toDF("a", "b")
      .select(array_intersect(FuzzyJoin.deleteNeighborhood(col("a"), 2),
        FuzzyJoin.deleteNeighborhood(col("b"), 2)).as("common"))
      .collect()(0).getSeq[String](0)
    assert(shared.contains("cab"), shared)
    val out = FuzzyJoin.fuzzyJoin(leftToks, rightToks, "tok_a", "tok_b", 2)
      .filter(col("tok_a") === "abcab" && col("tok_b") === "cabxy")
    assert(out.count() == 0)
  }

  test("transposition at distance 2 is found ('tabel' ~ 'table')") {
    val out = FuzzyJoin.fuzzyJoin(leftToks, rightToks, "tok_a", "tok_b", 2)
      .filter(col("tok_a") === "tabel" && col("tok_b") === "table")
      .select("dist").as[Int].collect()
    assert(out.toSeq == Seq(2))
  }

  test("short tokens: depth-2 deletes of 2-char tokens do not error") {
    val out = FuzzyJoin.fuzzyJoin(leftToks, rightToks, "tok_a", "tok_b", 2)
      .filter(col("tok_a") === "ab" && col("tok_b") === "ba")
      .select("dist").as[Int].collect()
    assert(out.toSeq == Seq(2)) // transposition
  }

  test("plan: equi-join on the variant key, never a cartesian") {
    val p = FuzzyJoin.fuzzyJoin(leftToks, rightToks, "tok_a", "tok_b", 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("duplicate key rows pair per payload row — never silently dropped") {
    // two left rows share tok_a="table" with different payloads; both must
    // appear against every right match (theta-join semantics)
    val dupLeft = Seq(("table", 1), ("table", 2), ("tble", 3)).toDF("tok_a", "pay_a")
    val out = FuzzyJoin.fuzzyJoin(dupLeft, rightToks, "tok_a", "tok_b", 1)
    val want = dupLeft.crossJoin(rightToks)
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")))
      .filter(col("dist") <= 1)
    assert(rowSet(out) == rowSet(want))
    // both payloads of the duplicated key survived
    assert(out.filter(col("tok_a") === "table" && col("tok_b") === "table")
      .select("pay_a").as[Int].collect().toSet == Set(1, 2))
  }

  test("guards: colliding column names are rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(leftToks, leftToks, "tok_a", "tok_a", 2)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(leftToks, rightToks, "tok_a", "tok_b", 3)
    }
  }

  test("tokenSetRepMatch: reorder-invariant (permutation scores 1.0) where Jaro-Winkler misses") {
    val rows = Seq(
      (1L, "b1", "acme supply co"),
      (2L, "b1", "supply co acme"),     // permutation of 1
      (3L, "b1", "acme supply corp"),   // 2-of-3 token overlap
      (4L, "b1", "zenith gear works"),  // disjoint, same brand
      (5L, "b2", "acme supply co")      // other brand: blocked apart
    ).toDF("id", "brand", "name")
    val block = Seq(col("brand"), array_min(split(col("name"), " ")))
    val out = FuzzyJoin.tokenSetRepMatch(rows, "id", "name", block, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out((1L, 2L)) == 1.0, s"permutation must score exactly 1.0: $out")
    // shared 'acme supply' are COMMON tokens (df 3 of 4 forms) — idf
    // weighting pushes the pair to ~0.31, well under the permutation
    assert(out.contains((1L, 3L)) && out((1L, 3L)) < 0.5,
      s"partial overlap on common tokens scores low: $out")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L), s"disjoint matched: $out")
    assert(!out.keySet.exists(p => p._1 == 5L || p._2 == 5L), s"cross-brand matched: $out")
    // the whole-string scorer misses the SAME permutation pair at its
    // catalog threshold — the gap this scorer exists to close
    val jw = FuzzyJoin.jaroRepMatch(rows, "id", "name", block, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jw.contains((1L, 2L)), s"JW unexpectedly caught the reorder: $jw")
  }

  test("tokenSetRepMatch: rarity weighting ranks shared-rare-token pairs above shared-common-token pairs") {
    // 'anvil' appears in 4 of 6 forms (common), 'quartz' in 2 (rare):
    // the quartz-sharing pair must outscore the anvil-sharing pair
    val rows = Seq(
      (1L, "b", "large anvil"), (2L, "b", "red anvil"),
      (3L, "b", "small anvil"), (4L, "b", "old anvil"),
      (5L, "b", "ancient quartz"), (6L, "b", "antique quartz")
    ).toDF("id", "brand", "name")
    // block on brand only so all pairs are scored
    val out = FuzzyJoin.tokenSetRepMatch(rows, "id", "name",
      Seq(col("brand")), threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(out((5L, 6L)) > out((1L, 2L)),
      s"rare shared token must outweigh common shared token: $out")
  }

  test("tokenSetRepMatch: collapse-first — duplicate forms carry member counts, not extra scorings") {
    val rows = Seq(
      (7L, "b", "acme supply"), (8L, "b", "acme supply"), (9L, "b", "supply acme")
    ).toDF("id", "brand", "name")
    val out = FuzzyJoin.tokenSetRepMatch(rows, "id", "name",
      Seq(col("brand")), threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    // exactly ONE rep pair: (min id 7 of the duplicated form, 9), n1 = 2
    assert(out.toSeq == Seq(((7L, 9L), (2L, 1L))), out.mkString(","))
  }
}
