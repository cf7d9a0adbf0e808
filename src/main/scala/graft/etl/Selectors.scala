package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C1-C4: per-site-family select stages (jobs/etl_job.py:164-257).
  *
  * The reference writes 9 near-identical branches by hand; here one
  * parameterized `branch` covers all of them (SURVEY.md §7.1). Output
  * columns (order matters — downstream unions are positional):
  * maid, siteseq, userid, timestamp, logtype, productCode, productName.
  *
  * Scale note: each branch is a filter+project over the same scan —
  * narrow, no shuffle. Catalyst pushes `logtype`/`siteseq` predicates
  * into the parquet scan; the N-branch union re-reads the scan N times
  * unless the caller caches (see Pipeline.run's cache decision).
  */
object Selectors {

  private def branch(df: DataFrame, ids: Seq[String], b: Branch): DataFrame = {
    val base = df
      .filter(col("logtype").isin(b.logtypes: _*) && col("info.siteseq").isin(ids: _*))
      .select(
        col("maid"),
        col("info.siteseq").as("siteseq"),
        col("userid"),
        col("timestamp"),
        col("logtype"),
        json_tuple(col("custom"), b.codeKey, b.nameKey).as(Seq("productCode", "productName")))
    if (b.codeFromUrlLastSegment)
      // type2 view rows: productCode = last '/'-segment of og:url
      // (jobs/etl_job.py:227,234-235)
      base.select(
        col("maid"), col("siteseq"), col("userid"), col("timestamp"), col("logtype"),
        element_at(split(col("productCode"), "/"), -1).as("productCode"),
        col("productName"))
    else base
  }

  /** Apply one family's branches and union them (positionally, like the
    * reference's `unionAll`). Returns None when the id list is empty. */
  def selectFamily(df: DataFrame, ids: Seq[String], family: SiteFamily): Option[DataFrame] =
    if (ids.isEmpty) None
    else Some(family.branches.map(branch(df, ids, _)).reduce(_ union _))

  /** C1∪C2∪C3∪C4 for all configured families (jobs/etl_job.py:146-151). */
  def selectAll(df: DataFrame, types: TransformTypes): DataFrame = {
    val parts = types.familyIds.flatMap { case (fam, ids) => selectFamily(df, ids, fam) }
    require(parts.nonEmpty, "no site families configured")
    parts.reduce(_ union _)
  }
}
