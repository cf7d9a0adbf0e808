package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, the latest right row
  * with right.ts <= left.ts, per key — the canonical time-series
  * enrichment (trade→quote, event→latest-profile) that plain SQL can
  * only express as a correlated subquery or range self-join.
  *
  * Implementation is the scalable union+window form, NOT a range join:
  * tag both sides, union them, and carry the latest right row forward
  * as ONE struct with last_value(ignoreNulls) over
  * (key ORDER BY ts, tag). One shuffle on the key, a sort within each
  * key partition, no row-pair blowup, no broadcast requirement on
  * either side — the shape that survives 100 TB. The struct carries the
  * right row atomically, so nullable right columns can't mix rows.
  * Ties (right.ts == left.ts) match, as in DuckDB/kdb ASOF semantics
  * (the right row sorts before the left row at equal ts). Left rows
  * with no prior right row keep null right values (left-join flavor).
  *
  * The right side must be unique per (key, ts) — pre-aggregate it if
  * not — otherwise "the" matching row is ill-defined.
  */
object AsOf {

  /** `direction = "backward"` (default): latest right row with
    * right.ts <= left.ts — trade→last-quote. `direction = "forward"`:
    * earliest right row with right.ts >= left.ts — event→next-action.
    * Both directions are the same one-shuffle union+window plan; only
    * the traversal order flips (forward walks each key partition in
    * descending ts, so "last right seen" is the minimal right.ts at or
    * after the left row). Ties match in both directions. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightVals: Seq[String], direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // __side/__rv are internal working columns; a left input already
    // carrying either would silently corrupt the union/window below.
    // Same for a right value whose name collides with a left column —
    // the final select would be ambiguous.
    require(!leftCols.contains("__side") && !leftCols.contains("__rv"),
      "asofJoin: left input must not contain reserved columns __side/__rv")
    rightVals.filter(leftCols.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"asofJoin: right value column '$c' collides with a left column; rename one side"))
    val rvType = StructType(rightVals.map(c => right.schema(c).copy(name = c)))
    val leftTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val rightTagged = right.select(
      col(key), col(ts), lit(0).as("__side"),
      struct(rightVals.map(col): _*).as("__rv"))
    val tsOrd = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrd, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col("__rv")(c).as(c)): _*)
  }
}
