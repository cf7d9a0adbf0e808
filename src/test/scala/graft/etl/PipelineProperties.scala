package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5.3) — run by sbt's ScalaCheck
  * framework directly. Each property executes a small Spark job, so the
  * test count is kept low. */
object PipelineProperties extends Properties("etl.pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val genProductString: Gen[String] =
    Gen.listOfN(12, Gen.oneOf('a', 'b', '"', ',', 'x')).map(_.mkString)

  /** C8: the comma-scrub is idempotent — a second application never
    * changes the result (the regex leaves no scrubable comma behind). */
  property("removeComma idempotent") = forAll(genProductString) { s =>
    import spark.implicits._
    val df = Seq((s, s)).toDF("productCode", "productName")
    val once = Transforms.removeComma(df)
    val twice = Transforms.removeComma(once)
    once.collect().toSeq == twice.collect().toSeq
  }

  private val genRows: Gen[List[(String, Option[String])]] =
    Gen.listOfN(6, for {
      maid <- Gen.identifier.map(_.take(8))
      uid <- Gen.option(Gen.identifier.map(_.take(8)))
    } yield (maid, uid))

  /** C11: userid is never null after the fallback, and row count is
    * preserved. */
  property("selectValidId: no null userid, count preserved") = forAll(genRows) { rows =>
    import spark.implicits._
    val df = rows.map { case (m, u) =>
      (m, "-48", u.orNull, "2019-06-01", "10:00:00", "purchase", "pc", "pn")
    }.toDF("maid", "siteseq", "userid", "transaction_date", "transaction_time",
      "logtype", "productCode", "productName")
    val out = Transforms.selectValidId(df)
    out.filter(col("userid").isNull).count() == 0 && out.count() == rows.size
  }

  /** C13: output of the dedup stage is duplicate-free even with planted
    * duplicates. */
  property("dropAllDuplicates: duplicate-free") = forAll(genRows) { rows =>
    import spark.implicits._
    val df = (rows ++ rows).map { case (m, u) => (m, u.orNull) }.toDF("a", "b")
    val out = Transforms.dropAllDuplicates(df)
    out.count() == out.dropDuplicates().count()
  }
}
