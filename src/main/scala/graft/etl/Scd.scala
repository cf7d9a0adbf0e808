package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the warehouse-side MERGE the
  * reference's ETL chain stops short of (its enrichment join reads a
  * static dim; real deployments must also maintain that dim as sources
  * drift; cf. /root/reference/jobs/etl_job.py:400-422's static join
  * table).
  *
  * Contract: `dim` is the CURRENT slice of the dimension (exactly one
  * open row per key: `valid_from`, `valid_to` null, `is_current` true,
  * plus the tracked attributes); `updates` is one row per key of new
  * attribute values. The output is the next current slice plus the rows
  * this batch closed:
  *   - key absent from updates, or update equals the open row → row
  *     passes through unchanged;
  *   - tracked attribute changed → the open row is emitted CLOSED
  *     (`valid_to` = batch time, `is_current` false) AND a new open row
  *     is emitted with the update's values;
  *   - key new to the dimension → one new open row.
  *
  * Scale shape (100 TB dim): ONE equi-join on the key (Catalyst
  * broadcasts small update batches on its own), then a narrow per-row
  * explode of 1–2 pre-built structs — no window, no global sort, no
  * second pass. History stays append-only: closed rows are a delta the
  * caller appends to the history table; the current slice is rewritten,
  * which is the standard SCD2 deployment layout (history partitions are
  * immutable).
  */
object Scd {

  /** Type-2 merge of `updates` into the current slice `dim` at
    * `batchTs`. `tracked` are the change-detected attribute columns;
    * both inputs must carry them under the same names, and `dim` must
    * also carry `valid_from`, `valid_to`, `is_current`. Comparison is
    * null-safe (a null attribute equals null, differs from non-null). */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
                tracked: Seq[String], batchTs: Column): DataFrame = {
    require(tracked.nonEmpty, "tracked attribute list must not be empty")
    val meta = Seq("valid_from", "valid_to", "is_current")
    meta.foreach(c => require(dim.columns.contains(c), s"dim must carry $c"))
    val u = updates.select(
      col(key) +: tracked.map(c => col(c).as(s"_u_$c")) :+ lit(true).as("_u_present"): _*)
    val d = dim.withColumn("_d_present", lit(true))
    val j = d.join(u, Seq(key), "full_outer")

    val isNew = col("_d_present").isNull
    val changed = col("_d_present").isNotNull && col("_u_present").isNotNull &&
      tracked.map(c => !(col(c) <=> col(s"_u_$c"))).reduce(_ || _)

    def row(vals: Seq[Column], vf: Column, vt: Column, cur: Column): Column =
      struct(vals.zip(tracked).map { case (v, n) => v.as(n) } :+
        vf.as("valid_from") :+ vt.as("valid_to") :+ cur.as("is_current"): _*)

    // typed-null valid_to of batchTs's type, so struct branches line up
    val noEnd = when(lit(false), batchTs)
    val passthrough = row(tracked.map(col), col("valid_from"), col("valid_to"), col("is_current"))
    val closedOld = row(tracked.map(col), col("valid_from"), batchTs, lit(false))
    val newOpen = row(tracked.map(c => col(s"_u_$c")), batchTs, noEnd, lit(true))

    val rows = when(isNew, array(newOpen))
      .when(changed, array(closedOld, newOpen))
      .otherwise(array(passthrough))
    j.select(col(key), explode(rows).as("_r")).select(col(key), col("_r.*"))
  }
}
