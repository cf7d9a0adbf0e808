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
}
