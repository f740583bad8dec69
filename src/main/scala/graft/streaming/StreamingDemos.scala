package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event row shape for typed streaming demos (matches the `events`
  * fixture minus props).
  */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
  event_type: String, value: Double)

/** Open-session state for the flatMapGroupsWithState sessionizer
  * (top-level: the state Encoder's generated code must reach it).
  */
case class SessionState(start_us: Long, last_us: Long, n: Long)

/** Per-user fold through Spark 4's `transformWithState` arbitrary-state
  * API (the successor to mapGroupsWithState: named state variables via
  * the handle, timers, TTL). State is two ValueStates — the count and
  * the integer-cent sum (order-independent, like any shuffle aggregate).
  * Top-level class: the processor is serialized to executors.
  */
class UserFoldProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long), (Long, Long, Double, Long)] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var nState: ValueState[Long] = _
  @transient private var centState: ValueState[Long] = _
  @transient private var purchState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    centState = getHandle.getValueState[Long]("cents", Encoders.scalaLong, TTLConfig.NONE)
    purchState = getHandle.getValueState[Long]("purch", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Double, Long)] = {
    var n = if (nState.exists()) nState.get() else 0L
    var cents = if (centState.exists()) centState.get() else 0L
    var purch = if (purchState.exists()) purchState.get() else 0L
    rows.foreach { case (_, c, isPurchase) =>
      n += 1; cents += c; purch += isPurchase
    }
    nState.update(n); centState.update(cents); purchState.update(purch)
    Iterator.single((key, n, cents / 100.0, purch))
  }
}

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

  /** Watermarked session windows (30-min gap) in streaming mode —
    * sessions emit in append mode once the watermark passes their end;
    * state is keyed (user, session) and bounded by the watermark.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))

  /** Session row emitted by the custom sessionizer. */
  case class SessionOut(user_id: Long, start_us: Long, last_us: Long,
    n_events: Long, closed: Boolean)

  /** Custom sessionization via flatMapGroupsWithState: an explicit
    * per-user state machine (open session start/last/count) with an
    * event-time timeout — the fully-general stateful operator shape for
    * logic session_window can't express. Emits a closed-session row on
    * gap/timeout and an open-session snapshot per batch.
    */
  def sessionize(events: Dataset[Ev],
      gapUs: Long = 30L * 60 * 1000000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          if (state.hasTimedOut) {
            val s = state.get
            out += SessionOut(user, s.start_us, s.last_us, s.n, closed = true)
            state.remove()
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            sorted.foreach { e =>
              val tUs = e.ts.getTime * 1000L
              cur match {
                case Some(s) if tUs - s.last_us > gapUs =>
                  out += SessionOut(user, s.start_us, s.last_us, s.n,
                    closed = true)
                  cur = Some(SessionState(tUs, tUs, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.start_us, tUs, s.n + 1))
                case None =>
                  cur = Some(SessionState(tUs, tUs, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_us / 1000L + gapUs / 1000L)
              out += SessionOut(user, s.start_us, s.last_us, s.n,
                closed = false)
            }
          }
          out.iterator
      }
  }

  /** Stream-stream inner join: purchases joined to the same user's
    * signups within [-1h, 0] event time. Both sides watermarked so the
    * join state is bounded — the standard watermarked interval-join
    * contract (state for a side is dropped once the other side's
    * watermark passes the interval).
    */
  def purchaseAfterSignup(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("p_user"),
        unix_micros(col("p_ts")).as("purchase_us"),
        unix_micros(col("s_ts")).as("signup_us"))
  }

  /** STREAM-STATIC enrichment join: each micro-batch of the event
    * stream joins the static dimension — no watermark and no join state
    * on either side (the static side is re-planned per batch, so a
    * dimension refresh between batches is picked up). The explicit
    * `broadcast` pins the scale shape: the stream side never shuffles,
    * which at 100 TB/day of events against a GB-scale dimension is the
    * difference between a map-side hash probe and re-partitioning the
    * firehose. */
  def enrichBySegment(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim),
        events("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"), col("value"))

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
