package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each left row with the right rows whose
  * timestamp falls in [left.ts - window, left.ts), per key.
  *
  * A naive formulation is an equi-join on the key with a range
  * predicate — Spark executes that as a join + filter, which is fine
  * per key but degenerates when keys are hot. This implementation uses
  * time BUCKETING: both sides get a bucket id (floor(epoch/window)),
  * the right side is duplicated into (bucket, bucket+1) — any interval
  * of length `window` spans at most two buckets — and the join key
  * becomes (key, bucket), turning the range join into an equi-join
  * whose per-task work is bounded by bucket population, not key
  * population. The exact range predicate filters the 2× candidates.
  * Timestamps compare at SECOND precision (integer epoch) on both
  * sides, which keeps the boundary arithmetic engine-portable.
  */
object RangeJoin {

  /** Count right rows in [left.ts - windowSec, left.ts) per left row;
    * left rows with no matches keep count 0 (left-join flavor). */
  def slidingCount(left: DataFrame, right: DataFrame, key: String, ts: String,
                   windowSec: Long, countAs: String): DataFrame = {
    val lb = left
      .withColumn("__ls", unix_timestamp(col(ts)))
      .withColumn("__b", floor(col("__ls") / windowSec))
    val rb = right
      .select(col(key).as("__rkey"), unix_timestamp(col(ts)).as("__rs"))
      .withColumn("__b", explode(array(
        floor(col("__rs") / windowSec), floor(col("__rs") / windowSec) + 1)))
    // NOTE: left rows are identified by their full column tuple for the
    // re-aggregation — pass a left side with a unique id column.
    lb.join(rb,
        lb(key) === col("__rkey") && lb("__b") === rb("__b") &&
          col("__rs") >= col("__ls") - windowSec && col("__rs") < col("__ls"),
        "left_outer")
      .groupBy(left.columns.map(lb(_)): _*)
      .agg(count(col("__rs")).as(countAs))
  }

  /** True interval-OVERLAP (theta) join: pairs where
    * [lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅, per `key` — the shape the
    * bucketed point-in-window join above cannot express (both sides are
    * intervals of arbitrary length).
    *
    * A naive theta join is a per-key cross product with a range filter
    * — BroadcastNestedLoop/cartesian at cluster scale. Here each
    * interval explodes into the `bucketSec` buckets it COVERS
    * (`sequence(start/B, (end-1)/B)` — cost len/B + 1 rows), the join
    * becomes an equi-join on (key, bucket) whose per-task work is
    * bounded by bucket population, candidates are deduped on the id
    * pair (overlapping intervals share up to len/B buckets), and the
    * exact overlap predicate filters the rest. Pick `bucketSec` near
    * the typical interval length: much smaller multiplies the explode,
    * much larger multiplies false candidates per bucket.
    *
    * Inputs carry integer-second bounds (engine-portable boundary
    * arithmetic, like slidingCount); EMPTY intervals (end <= start) are
    * dropped on both sides — `sequence` would otherwise descend and
    * emit phantom buckets. Output: both id columns, the key, and the
    * exact overlap seconds (> 0 ⟺ genuine overlap; touching intervals
    * never pair because the predicate is strict). */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
                  lId: String, lStart: String, lEnd: String,
                  rId: String, rStart: String, rEnd: String,
                  bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"overlapJoin: bucketSec must be > 0, got $bucketSec")
    val lb = left.filter(col(lEnd) > col(lStart))
      .select(col(lId), col(key).as("__lk"), col(lStart), col(lEnd),
        explode(sequence(floor(col(lStart) / bucketSec),
          floor((col(lEnd) - 1) / bucketSec))).as("__b"))
    val rb = right.filter(col(rEnd) > col(rStart))
      .select(col(rId), col(key).as("__rk"), col(rStart), col(rEnd),
        explode(sequence(floor(col(rStart) / bucketSec),
          floor((col(rEnd) - 1) / bucketSec))).as("__b"))
    lb.join(rb, col("__lk") === col("__rk") && lb("__b") === rb("__b") &&
        col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .select(col(lId), col(rId), col("__lk").as(key),
        (least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
          .as("overlap_s"))
      .dropDuplicates(lId, rId)
  }
}
