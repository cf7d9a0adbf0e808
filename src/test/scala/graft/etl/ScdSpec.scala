package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scd.scd2Merge: every merge path (passthrough, no-op update,
  * close+reopen, insert), null-safe attribute comparison, and the plan
  * shape (one key join, no window/sort). */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = "2020-01-01 00:00:00"
  private val t1 = "2024-07-01 00:00:00"

  private def dim() = Seq(
    (1L, Option(10.0), "A"), // will change
    (2L, Option(20.0), "B"), // no update at all
    (3L, Option(30.0), "C"), // no-op update (same values)
    (4L, Option.empty[Double], "D") // null attr, stays null → no-op
  ).toDF("k", "bal", "seg")
    .withColumn("valid_from", lit(t0).cast("timestamp"))
    .withColumn("valid_to", lit(null).cast("timestamp"))
    .withColumn("is_current", lit(true))

  private def updates() = Seq(
    (1L, Option(11.0), "A"), // changed bal
    (3L, Option(30.0), "C"), // identical → no-op
    (4L, Option.empty[Double], "D"), // null == null → no-op
    (9L, Option(90.0), "Z") // brand-new key
  ).toDF("k", "bal", "seg")

  private def merged() =
    Scd.scd2Merge(dim(), updates(), "k", Seq("bal", "seg"),
      lit(t1).cast("timestamp"))

  test("all four merge paths produce the expected rows") {
    val rows = merged()
      .select(col("k"), col("bal"), col("seg"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .as[(Long, Option[Double], String, String, Option[String], Boolean)]
      .collect().toSet
    assert(rows == Set(
      (1L, Some(10.0), "A", t0, Some(t1), false), // closed old
      (1L, Some(11.0), "A", t1, None, true),      // reopened
      (2L, Some(20.0), "B", t0, None, true),      // untouched passthrough
      (3L, Some(30.0), "C", t0, None, true),      // no-op update passthrough
      (4L, None, "D", t0, None, true),            // null==null no-op
      (9L, Some(90.0), "Z", t1, None, true)       // insert
    ))
  }

  test("exactly one current row per surviving key") {
    val cur = merged().filter(col("is_current"))
      .groupBy("k").count().filter(col("count") =!= 1).count()
    assert(cur == 0)
  }

  test("null -> value transition counts as a change") {
    val up = Seq((4L, Option(44.0), "D")).toDF("k", "bal", "seg")
    val out = Scd.scd2Merge(dim(), up, "k", Seq("bal", "seg"),
      lit(t1).cast("timestamp"))
    val k4 = out.filter(col("k") === 4L)
      .select("bal", "is_current").as[(Option[Double], Boolean)].collect().toSet
    assert(k4 == Set((None, false), (Some(44.0), true)))
  }

  test("plan: single key join + explode, no window or global sort") {
    val p = merged().queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(p.contains("Generate"), p) // the struct explode
  }

  test("guards: dim must carry the SCD metadata columns") {
    intercept[IllegalArgumentException] {
      Scd.scd2Merge(Seq((1L, 1.0, "A")).toDF("k", "bal", "seg"),
        updates(), "k", Seq("bal", "seg"), lit(t1).cast("timestamp"))
    }
  }
}
