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
}
