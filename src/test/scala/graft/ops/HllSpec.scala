package graft.ops

import graft.SparkSpec

/** Pins for the deterministic HLL: estimate accuracy in the raw
  * regime, duplicate-insensitivity (the defining sketch property), and
  * per-group independence.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within the m=256 error envelope on 10k known-distinct keys") {
    val df = (1L to 10000L).map(k => ("g", k)).toDF("grp", "k")
    val r = Hll.hllDistinct(df, Seq("grp"), "k").collect().head
    assert(r.getAs[Long]("exact_distinct") == 10000L)
    val est = r.getAs[Double]("hll_distinct")
    // 3 sigma at 1.04/sqrt(256) = 19.5%
    assert(math.abs(est - 10000.0) / 10000.0 < 0.195, s"estimate $est")
  }

  test("duplicates cannot move the estimate: 5x-replicated keys give the identical sketch") {
    val base = (1L to 3000L).map(k => ("g", k))
    val dup = base ++ base ++ base ++ base ++ base
    val e1 = Hll.hllDistinct(base.toDF("grp", "k"), Seq("grp"), "k")
      .collect().head.getAs[Double]("hll_distinct")
    val e2 = Hll.hllDistinct(dup.toDF("grp", "k"), Seq("grp"), "k")
      .collect().head.getAs[Double]("hll_distinct")
    assert(e1 == e2, s"$e1 vs $e2")
  }

  test("groups sketch independently") {
    val df = ((1L to 2000L).map(k => ("a", k)) ++ (1L to 8000L).map(k => ("b", k)))
      .toDF("grp", "k")
    val out = Hll.hllDistinct(df, Seq("grp"), "k").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hll_distinct")).toMap
    assert(math.abs(out("a") - 2000.0) / 2000.0 < 0.195, out.toString)
    assert(math.abs(out("b") - 8000.0) / 8000.0 < 0.195, out.toString)
  }
}
