package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** C12 (jobs/etl_job.py:380-423): category enrichment.
  *
  * Semantics preserved from the reference:
  *   - all log columns upper-cased;
  *   - INNER join on (SITESEQ, PRODUCTCODE) = (SHOPPING_ID, ITEM_CODE):
  *     non-login rows without a category match are dropped — this is
  *     intentional, NOT a left join (SURVEY.md §2.3);
  *   - login rows are re-appended null-padded with the 11 category
  *     columns. A login row that also matched the join appears twice and
  *     survives the final dedup because its category columns differ —
  *     reference behavior, reproduced;
  *   - the reference's positional union swaps INTG_ID/ITEM_CODE between
  *     the two sides (jobs/etl_job.py:400-401 vs 417) — invisible there
  *     because both are null strings on the login side. We keep the
  *     JOINED side's column order as the output schema and align the
  *     login side to it, which is value-identical to the reference
  *     (documented deviation, SURVEY.md §2.4 U4);
  *   - USER_ID truncated to 100 chars (MySQL column-width guard).
  *
  * Scale: the category side is one dimension table (a MySQL view in the
  * reference) — small by construction, so we `broadcast` it explicitly:
  * the join then shuffles nothing and the 100 TB fact side streams
  * through map tasks. If the dim ever outgrows broadcast range, Catalyst
  * falls back to shuffled hash join on the two key columns.
  */
object Enrichment {

  def joinWithCategories(logs: DataFrame, categories: DataFrame): DataFrame = {
    val up = logs.toDF(logs.columns.map(_.toUpperCase): _*)

    val joined = up
      .join(broadcast(categories),
        up("SITESEQ") === categories("SHOPPING_ID") &&
          up("PRODUCTCODE") === categories("ITEM_CODE"))
      .select(
        up("USERID").as("USER_ID"),
        up("SITESEQ").as("SHOPPING_ID"),
        up("TRANSACTION_DATE"), up("TRANSACTION_TIME"),
        up("LOGTYPE").as("LOG_TYPE"),
        col("INTG_ID"), col("ITEM_CODE"), col("ITEM_NAME"),
        col("CAT1"), col("CAT2"), col("CAT3"), col("CAT4"),
        col("INTG_CAT1"), col("INTG_CAT2"), col("INTG_CAT3"), col("INTG_CAT4"))

    val nullStr = lit(null).cast(StringType)
    val loginRows = up
      .filter(col("LOGTYPE") === "login")
      .select(
        col("USERID").as("USER_ID"),
        col("SITESEQ").as("SHOPPING_ID"),
        col("TRANSACTION_DATE"), col("TRANSACTION_TIME"),
        col("LOGTYPE").as("LOG_TYPE"),
        nullStr.as("INTG_ID"), nullStr.as("ITEM_CODE"), nullStr.as("ITEM_NAME"),
        nullStr.as("CAT1"), nullStr.as("CAT2"), nullStr.as("CAT3"), nullStr.as("CAT4"),
        nullStr.as("INTG_CAT1"), nullStr.as("INTG_CAT2"),
        nullStr.as("INTG_CAT3"), nullStr.as("INTG_CAT4"))

    joined.union(loginRows)
      .withColumn("USER_ID", substring(col("USER_ID"), 1, 100))
  }
}
