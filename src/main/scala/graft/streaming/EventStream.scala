package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the batch operators re-expressed as
  * streaming transforms (readStream → transform → writeStream).
  * The reference is batch-per-month re-runs (configs/etl_config.json:28);
  * this is the streaming upgrade path for the same event shape.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Long,
                                  total_value: Double, closed: Boolean)

  /** Tumbling-window counts with a watermark: late events beyond 1 hour
    * are dropped; state is bounded. */
  def windowedCounts(events: DataFrame,
                     window_dur: String = "1 hour",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_dur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup: drop repeated event_ids within the watermark
    * horizon — the streaming form of the pipeline's C13 stage; state is
    * bounded by the watermark. */
  def streamingDedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state: per-user session aggregation with a processing-time
    * timeout (mapGroupsWithState — the arbitrary-state operator). */
  def sessionize(events: Dataset[Event]): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionSummary, SessionSummary](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, rows, state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val s = state.get.copy(closed = true)
            state.remove()
            s
          } else {
            val prev = state.getOption.getOrElse(SessionSummary(uid, 0L, 0.0, closed = false))
            var n = prev.n_events
            var v = prev.total_value
            rows.foreach { e => n += 1; v += e.value }
            val next = prev.copy(n_events = n, total_value = v)
            state.update(next)
            state.setTimeoutDuration("30 minutes")
            next
          }
      }
  }
}
