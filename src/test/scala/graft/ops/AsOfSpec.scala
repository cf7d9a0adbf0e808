package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 10L, ts(5)),   // before any quote -> null
      (2L, 10L, ts(15)),  // after q1 -> 100
      (3L, 10L, ts(30)),  // tie with q2 -> 200 (>= semantics)
      (4L, 10L, ts(45)),  // after q2 -> 200
      (5L, 99L, ts(45))   // other key, no quotes -> null
    ).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts(10), 100.0), // q1
      (10L, ts(30), 200.0)  // q2
    ).toDF("key", "t", "px")
    val out = AsOf.asofJoin(left, right, "key", "t", Seq("px"))
      .select(col("id"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) == null)
    assert(out(2L) == 100.0)
    assert(out(3L) == 200.0)
    assert(out(4L) == 200.0)
    assert(out(5L) == null)
  }

  test("asofJoin forward picks the earliest right row at-or-after each left row") {
    val left = Seq(
      (1L, 10L, ts(5)),   // before q1 -> next is q1 (100)
      (2L, 10L, ts(10)),  // tie with q1 -> 100 (>= semantics)
      (3L, 10L, ts(15)),  // between -> q2 (200)
      (4L, 10L, ts(45)),  // after all quotes -> null
      (5L, 99L, ts(5))    // other key, no quotes -> null
    ).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts(10), 100.0), // q1
      (10L, ts(30), 200.0)  // q2
    ).toDF("key", "t", "px")
    val out = AsOf.asofJoin(left, right, "key", "t", Seq("px"), direction = "forward")
      .select(col("id"), col("px")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) == 100.0)
    assert(out(2L) == 100.0)
    assert(out(3L) == 200.0)
    assert(out(4L) == null)
    assert(out(5L) == null)
  }

  test("bucketed range join matches the naive theta join exactly") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      (i.toLong, (i % 5).toLong, ts(rnd.nextInt(59)))).toDF("id", "key", "t")
    val right = (1 to 400).map(i =>
      ((i % 5).toLong, ts(rnd.nextInt(59)))).toDF("key", "t")
    val fast = RangeJoin.slidingCount(left, right, "key", "t", 600L, "n")
      .select("id", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: key-equi join + range filter (the spec of the semantics)
    val l = left.select(col("id"), col("key"), unix_timestamp(col("t")).as("ls"))
    val r = right.select(col("key").as("k2"), unix_timestamp(col("t")).as("rs"))
    val naive = l.join(r, col("key") === col("k2") &&
        col("rs") >= col("ls") - 600 && col("rs") < col("ls"), "left_outer")
      .groupBy(col("id")).agg(count(col("rs")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == naive)
  }

  test("overlapJoin matches the naive theta join; drops empties; excludes touching") {
    val rnd = new scala.util.Random(11)
    // intervals of wildly mixed lengths (0..5000s) across bucket spans
    def mk(n: Int, pfx: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(50000).toLong
      (pfx + i, (i % 4).toLong, s, s + rnd.nextInt(5000).toLong) // len 0 ⇒ empty
    }
    val left = mk(150, 1000L).toDF("l_id", "k", "ls", "le")
    val right = mk(250, 2000L).toDF("r_id", "k", "rs", "re")
    val fast = RangeJoin.overlapJoin(left, right, "k",
      "l_id", "ls", "le", "r_id", "rs", "re", bucketSec = 700L)
      .select("l_id", "r_id", "overlap_s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val naive = left.filter(col("le") > col("ls"))
      .join(right.filter(col("re") > col("rs")).withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("ls") < col("re") && col("rs") < col("le"))
      .select(col("l_id"), col("r_id"),
        (least(col("le"), col("re")) - greatest(col("ls"), col("rs"))).as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fast == naive)
    assert(naive.nonEmpty && naive.values.forall(_ > 0)) // strict: touching never pairs
    // touching intervals explicitly: [0,10) vs [10,20) must not pair
    val a = Seq((1L, 0L, 0L, 10L)).toDF("l_id", "k", "ls", "le")
    val b = Seq((2L, 0L, 10L, 20L)).toDF("r_id", "k", "rs", "re")
    assert(RangeJoin.overlapJoin(a, b, "k", "l_id", "ls", "le",
      "r_id", "rs", "re", 7L).count() == 0L)
  }

  test("asofJoin rejects reserved/colliding column names and bad directions") {
    val left = Seq((1L, 1L, ts(1))).toDF("id", "key", "t")
    val right = Seq((1L, ts(1), 1.0)).toDF("key", "t", "px")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left.withColumn("__rv", col("id")), right, "key", "t", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right.withColumnRenamed("px", "id"), "key", "t", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, "key", "t", Seq("px"), direction = "sideways")
    }
  }

  test("asofJoin carries multi-column right values atomically") {
    val left = Seq((1L, 1L, ts(20))).toDF("id", "key", "t")
    val right = Seq(
      (1L, ts(5), Some("a"), 1.0),
      (1L, ts(10), None: Option[String], 2.0) // latest row has a NULL col
    ).toDF("key", "t", "label", "px")
    val r = AsOf.asofJoin(left, right, "key", "t", Seq("label", "px")).collect().head
    // both values must come from the ts(10) row: label null, px 2.0 —
    // per-column carry would have mixed in "a" from the older row
    assert(r.isNullAt(r.fieldIndex("label")))
    assert(r.getDouble(r.fieldIndex("px")) == 2.0)
  }
}
