package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event row shape for typed streaming demos (matches the `events`
  * fixture minus props).
  */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
  event_type: String, value: Double)

/** SURVEY.md §2.8 — true Structured Streaming transforms.
  *
  * Each function takes a (possibly streaming) DataFrame and returns the
  * transformed frame, so the same logic runs against MemoryStream in
  * tests (deterministic, no timers — SURVEY.md §5.2) and against file /
  * Kafka-style sources in production. State scales horizontally: all
  * stateful ops key by window/event_id/user_id.
  */
object StreamingDemos {

  /** Watermarked tumbling-window counts — append-mode-capable: windows
    * emit once the 10-minute watermark passes their end, late rows are
    * dropped against state.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("start_us"),
        col("event_type"), col("n"))

  /** Stateful exactly-once dedup keyed on event_id; state expires with
    * the watermark so memory is bounded at 100 TB/day rates.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state via mapGroupsWithState: running event count per
    * user (update output mode).
    */
  def runningCountPerUser(events: Dataset[Ev]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          (user, n)
      }
  }
}
