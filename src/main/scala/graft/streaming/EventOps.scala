package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.8 — event-time semantics, batch-emulated.
  *
  * The oracle path runs batch-only, so these express windowing semantics
  * with the same `window()`/`session_window()` grouping Structured
  * Streaming uses — identical results in batch and streaming mode. True
  * incremental variants (watermark drops, state-store dedup, foreachBatch
  * sinks) live in [[StreamingDemos]] and are unit-tested with
  * MemoryStream (SURVEY.md §5.2).
  *
  * Scale notes (100 TB stream): every aggregation keys on
  * (window, type) or (user, session) — state partitions horizontally;
  * the sliding window expands each event into 4 rows BEFORE the shuffle
  * (Spark's `Expand`), which is the standard cost of overlap.
  */
object EventOps {

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("start_us", "event_type")

  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("start_us", "event_type")

  /** Session windows (30-min gap) via the built-in session_window —
    * batch execution of the exact streaming construct.
    */
  def session(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  /** Gaps-and-islands sessionization with plain window functions — the
    * SQL-expressible equivalent of [[session]], and its oracle.
    */
  def sessionizeSql(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
      .withColumn("new_s",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(cum))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .orderBy("user_id", "sid")
  }

  /** Batch emulation of watermark late-row dropping: keep rows within
    * 10 minutes of the max event time seen.
    */
  def watermarkLate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val mx = e.agg(max("ts").as("max_ts"))
    e.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 10 MINUTE"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .orderBy("event_id")
  }

  /** Batch form of stateful dedup: double the input, dropDuplicates on
    * the key — survivors are exactly the original rows.
    */
  def dedupState(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
    e.union(e).dropDuplicates("event_id").orderBy("event_id")
  }

  /** Micro-batch parquet sink via foreachBatch + Trigger.AvailableNow,
    * then read back (no oracle — side effect + streaming runtime).
    */
  def foreachBatchSink(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.tempDir("graft_stream_sink")
    val schema = Tables(spark, dir, "orders").schema
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(tmp)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(tmp)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** mapGroupsWithState run in BATCH mode — Spark executes the same
    * typed state function over a bounded Dataset (state starts empty,
    * one invocation per key), so the custom-state API itself gets an
    * oracle-verified key instead of only MemoryStream unit coverage.
    * Emits per-user event count, total value (integer-snapped —
    * iteration order inside a group is partition-order-dependent, so
    * the fold must be order-independent exactly like a shuffle
    * aggregate), and last event time by (ts, event_id) order.
    */
  def mapGroupsBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val ds = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Double, Long)](
        GroupStateTimeout.NoTimeout) { case (uid, rows, _) =>
        var n = 0L; var cents = 0L
        var lastUs = Long.MinValue; var lastId = Long.MinValue
        rows.foreach { case (_, us, id, value) =>
          n += 1
          // HALF AWAY FROM ZERO, matching Spark's round(col*100, 0) in
          // every sibling key and DuckDB's round(): math.rint's
          // half-to-EVEN diverges on exact .5 cents (e.g. value 0.125)
          // the moment a fixture regen uses a finer value grid
          val x = value * 100
          cents += (if (x >= 0) math.floor(x + 0.5)
                    else math.ceil(x - 0.5)).toLong
          if (us > lastUs || (us == lastUs && id > lastId)) {
            lastUs = us; lastId = id
          }
        }
        (uid, n, cents / 100.0, lastUs)
      }
      .toDF("user_id", "n_events", "sum_value", "last_us")
      .orderBy("user_id")
  }

  /** `transformWithState` (Spark 4's arbitrary-state processor API) run
    * in BATCH mode — like [[mapGroupsBatch]] for the old API, this makes
    * the new state-variable surface itself an oracle-verified key: state
    * starts empty, each key's rows arrive in one handleInputRows call,
    * and the emitted fold must therefore equal the plain aggregate the
    * oracle states. Accumulation is integer cents — iteration order
    * within a key is partition-dependent, so the fold is written
    * order-independent exactly like a shuffle aggregate.
    */
  def transformWithStateBatch(spark: SparkSession, dir: String): DataFrame = {
    // transformWithState requires the RocksDB provider even in batch
    // (the HDFS-backed store doesn't implement the new state variables);
    // disable the snapshot-lag telemetry — its StateStoreCoordinator RPC
    // endpoint only exists under a real streaming query. BOTH confs go
    // on an ISOLATED child session: setting them on the shared session
    // would silently switch every streaming key that runs later in the
    // same JVM onto a provider it was never validated or benched under
    // (the cboStats leak class; Sessions.scala's no-mid-run-mutation
    // invariant).
    val s = spark.newSession()
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set(
      "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
      "false")
    // touch the StreamingQueryManager: it registers the driver-side
    // StateStoreCoordinator RPC endpoint the RocksDB store reports to —
    // under batch execution nothing else creates it
    s.streams.active
    val ds = Tables(s, dir, "events")
      .select(col("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      .as[(Long, Long, Long)]
    ds.groupByKey(_._1)
      .transformWithState(new UserFoldProcessor(),
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "n_events", "sum_value", "n_purchases")
      .orderBy("user_id")
  }

  /** Stream-stream interval join (click attribution), batch-emulated:
    * every click joins the views by the same user in the preceding 30
    * minutes. The batch plan is the scale shape Structured Streaming's
    * symmetric-hash join state would hold: both sides bucket into 30-min
    * time bands, the view side replicated into {band, band+1} so each
    * qualifying (view, click) pair meets on EXACTLY one (user, band)
    * equi-key (gap ≤ band width ⇒ the click's band is one of the two) —
    * no theta join, no post-dedup. The true streaming form (watermarked
    * `ts BETWEEN` join — state eviction replaces the band trick) runs in
    * StreamingSpec over MemoryStream with identical results.
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val e = Tables(spark, dir, "events")
    def band(c: Column): Column =
      (unix_micros(c) / lit(1800000000L)).cast("long")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withColumn("band",
        explode(array(band(col("view_ts")), band(col("view_ts")) + 1)))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withColumn("band", band(col("click_ts")))
    views.join(clicks, Seq("user_id", "band"))
      .filter(col("click_ts") >= col("view_ts") &&
        unix_micros(col("click_ts")) - unix_micros(col("view_ts"))
          <= 1800000000L)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
      .orderBy("user_id", "view_id", "click_id")
  }

  /** LEFT OUTER stream-stream interval join: every view row survives,
    * clicks attach when they landed within the 30-min window. In true
    * streaming the null rows emit only once the watermark passes the
    * view's join window (state eviction proves no match can still
    * arrive); batch emulation gets the same rows from a plain left join
    * of the banded inner matches back onto views. The banded inner join
    * is [[streamStreamJoin]]; the outer wrapper adds one broadcast-free
    * left join keyed on the view id — no second theta pass.
    */
  def streamStreamOuter(spark: SparkSession, dir: String): DataFrame = {
    val matches = streamStreamJoin(spark, dir)
      .select(col("view_id"), col("click_id"), col("lag_us"))
    val views = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("view_us"))
    views.join(matches, Seq("view_id"), "left_outer")
      .select(col("user_id"), col("view_id"), col("view_us"),
        col("click_id"), col("lag_us"))
      .orderBy("user_id", "view_id", "click_id")
  }

  /** State continuity ACROSS micro-batches: the events table split into
    * 4 files, streamed with `maxFilesPerTrigger=1` (so the backlog
    * drains in 4 micro-batches under Trigger.AvailableNow), aggregated
    * in complete mode to a memory sink. Each batch's HashAggregate
    * merges into the state store carried over from the previous batch —
    * the final table equals the one-shot batch aggregate ONLY if state
    * survives batch boundaries, which is exactly what the oracle
    * asserts. (foreachBatchSink drains in one batch; this key is the
    * multi-batch stateful variant.)
    */
  /** Run `body` (which starts AND fully drains a streaming query) with
    * 4 shuffle/state-store partitions instead of the session's 32
    * (r16, the stream-floor work — same rationale+race note as
    * GvtOps.drainGvtStream): a stateful micro-batch aggregate over a
    * handful of groups pays 32 state tasks per stage per batch from
    * the batch-suite default, and the partition count is pinned from
    * the conf by the ASYNC micro-batch thread, so the restore must
    * happen only after the drain completes. */
  private def withStreamPartitions[A](spark: SparkSession)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def multiBatchState(spark: SparkSession, dir: String): DataFrame = {
    // input staged ONCE per (prefix, sfDir) — a pure function of the
    // fixture, so bench rep 2+ measures the stream, not the staging
    val tmpIn = graft.Staging.memoDir("graft_stream_mb", dir) { tmp =>
      Tables(spark, dir, "events").repartition(4)
        .write.mode("overwrite").parquet(tmp)
    }
    val schema = Tables(spark, dir, "events").schema
    val name = "graft_multi_batch_state"
    withStreamPartitions(spark) {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmpIn)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          (sum(round(col("value") * 100, 0).cast("long")).cast("double")
            / 100).as("sum_value"))
        .writeStream
        // fresh-per-run checkpoint on tmpfs: state-store + offset-log
        // fsyncs were ~most of this key's 3.4 s (r7 verdict #6)
        .option("checkpointLocation",
          graft.Staging.fastTempDir("graft_ckpt_mb"))
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .select("event_type", "n_events", "sum_value")
      .orderBy("event_type")
  }

  /** CUSTOM V2 streaming source
    * ([[graft.sources.FixedWidthReplaySource]] — MicroBatchStream with
    * file-index offsets + advance-by-one AvailableNow pacing): the
    * events table is staged as 4 fixed-width batch files, replayed one
    * file per micro-batch through the custom source into a complete-mode
    * stateful aggregate. The oracle restates the batch aggregate over
    * the source table, so the key asserts the custom source's
    * offset/partition-planning contract end-to-end: a skipped,
    * re-served, or half-read file fails the hash. Completes the V2
    * surface matrix: batch read + write (FixedWidthDataSource) and now
    * streaming read. Cents stay integral through the text roundtrip.
    */
  def customSource(spark: SparkSession, dir: String): DataFrame = {
    val spec = "event_id:1:12:long,user_id:13:8:long,cents:21:14:long"
    val staged = graft.Staging.memoDir("graft_replay_src", dir) { tmp =>
      for (b <- 0 until 4) {
        val part = s"$tmp/stage_$b"
        Tables(spark, dir, "events")
          .filter(col("event_id") % 4 === b)
          .select(format_string("%-12d%-8d%-14d",
            col("event_id"), col("user_id"),
            round(col("value") * 100, 0).cast("long")).as("value"))
          .coalesce(1).write.mode("overwrite").text(part)
        val src = new java.io.File(part).listFiles()
          .find(f => f.getName.startsWith("part-")).get.toPath
        java.nio.file.Files.move(src,
          java.nio.file.Paths.get(tmp, f"batch-$b%02d.txt"))
      }
    }
    val name = "graft_replay_result"
    withStreamPartitions(spark) {
      val q = spark.readStream
        .format("graft.sources.FixedWidthReplaySource")
        .option("fields", spec)
        .load(staged)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
        .writeStream
        .option("checkpointLocation",
          graft.Staging.fastTempDir("graft_ckpt_replay"))
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .select("user_id", "n_events", "sum_cents")
      .orderBy("user_id")
  }

  /** The rate-micro-batch SOURCE (the deterministic load-generator
    * sibling of `rate`): batch k carries values [k·rows, (k+1)·rows)
    * all stamped startTimestamp + k·advance — closed-form, so the
    * source itself is oracle-able against generate_series. The query
    * drains ≥3 batches into a memory sink and bounds the result with
    * `value < 300` (stopping is asynchronous, so a 4th batch may land;
    * the filter makes the output schedule-independent). Windowed count
    * per batch-timestamp verifies the value→timestamp contract.
    */
  def rateSource(spark: SparkSession, dir: String): DataFrame = {
    val rows = 100
    val name = "graft_rate_source"
    val q = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rows)
      .option("numPartitions", 4)
      .option("startTimestamp", 0)
      .option("advanceMillisPerBatch", 1000)
      .load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      // bounded wait: an unguarded poll would hang the whole verify gate
      // if the stream ever failed to make progress
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while ((q.lastProgress == null || q.lastProgress.batchId < 2)
          && System.nanoTime() < deadline && q.exception.isEmpty)
        Thread.sleep(50)
      q.exception.foreach(throw _)
      // deadline expiry must FAIL the key, not dump a partial memory
      // table that the driver would misread as a correctness regression
      if (q.lastProgress == null || q.lastProgress.batchId < 2)
        throw new IllegalStateException(
          "rate-micro-batch stream stalled: batchId < 2 after 120s — " +
            "environment stall, not a query defect")
    } finally q.stop()
    q.awaitTermination()
    spark.table(name)
      .filter(col("value") < rows * 3)
      .groupBy(unix_millis(col("timestamp")).as("batch_ms"))
      .agg(count(lit(1)).as("n_rows"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy("batch_ms")
  }

  /** STREAM-STATIC enrichment join, batch-emulated: events joined to
    * the static customer dimension on user_id, rolled up by (segment,
    * event_type). The true streaming form is
    * [[StreamingDemos.enrichBySegment]] — a per-micro-batch broadcast
    * hash probe with NO state and NO watermark on either side
    * (StreamingSpec runs it over MemoryStream and matches this batch
    * result). Scale shape: the dimension broadcasts, the event
    * firehose never shuffles for the join — only the tiny rollup
    * exchanges. */
  def streamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val dim = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    StreamingDemos.enrichBySegment(e, dim)
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      .orderBy("segment", "event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_static_join" -> streamStaticJoin,
    "stream_custom_source" -> customSource,
    "stream_rate_source" -> rateSource,
    "stream_multi_batch_state" -> multiBatchState,
    "stream_stream_outer" -> streamStreamOuter,
    "stream_transform_state" -> transformWithStateBatch,
    "stream_stream_join" -> streamStreamJoin,
    "stream_mapgroups_batch" -> mapGroupsBatch,
    "stream_tumbling" -> tumbling,
    "stream_sliding" -> sliding,
    "stream_session" -> session,
    "stream_sessionize_sql" -> sessionizeSql,
    "stream_watermark_late" -> watermarkLate,
    "stream_dedup_state" -> dedupState,
    "stream_foreachbatch_sink" -> foreachBatchSink
  )

  def oracle: Map[String, String] = Map(
    "stream_static_join" ->
      ("SELECT c_mktsegment AS segment, event_type, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) " +
        "AS sum_cents " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "stream_custom_source" ->
      ("SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) " +
        "AS sum_cents FROM events GROUP BY user_id ORDER BY user_id"),
    "stream_rate_source" ->
      ("SELECT (v // 100) * 1000 AS batch_ms, count(*) AS n_rows, " +
        "min(v) AS min_value, max(v) AS max_value " +
        "FROM (SELECT unnest(range(0, 300)) AS v) " +
        "GROUP BY 1 ORDER BY 1"),
    "stream_multi_batch_state" ->
      ("SELECT event_type, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 " +
        "AS sum_value FROM events GROUP BY event_type ORDER BY event_type"),
    "stream_stream_outer" ->
      ("SELECT v.user_id AS user_id, v.event_id AS view_id, " +
        "epoch_us(v.ts) AS view_us, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(v.ts) AS lag_us " +
        "FROM events v LEFT OUTER JOIN events c ON v.user_id = c.user_id " +
        "AND c.event_type = 'click' AND c.ts >= v.ts " +
        "AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800000000 " +
        "WHERE v.event_type = 'view' " +
        "ORDER BY user_id, view_id, click_id"),
    "stream_transform_state" ->
      ("SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 " +
        "AS sum_value, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "stream_stream_join" ->
      ("SELECT v.user_id AS user_id, v.event_id AS view_id, " +
        "c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(v.ts) AS lag_us " +
        "FROM events v JOIN events c ON v.user_id = c.user_id " +
        "AND v.event_type = 'view' AND c.event_type = 'click' " +
        "AND c.ts >= v.ts " +
        "AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800000000 " +
        "ORDER BY user_id, view_id, click_id"),
    "stream_mapgroups_batch" ->
      ("SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 " +
        "AS sum_value, " +
        "max(epoch_us(ts)) AS last_us " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    "stream_tumbling" ->
      ("SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS start_us, " +
        "event_type, count(*) AS n, round(sum(value), 2) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "stream_sliding" ->
      ("SELECT start_us, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value FROM (" +
        "SELECT ((epoch_us(ts) // 900000000) - k) * 900000000 AS start_us, " +
        "event_type, value " +
        "FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) t(k)) " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "stream_session" ->
      ("WITH g AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT user_id, ts, " +
        "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g) " +
        "SELECT user_id, min(epoch_us(ts)) AS start_us, " +
        "max(epoch_us(ts)) + 1800000000 AS end_us, count(*) AS n_events " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, start_us"),
    "stream_sessionize_sql" ->
      ("WITH g AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        // CAST the window sum: DuckDB sums BIGINT into HUGEINT, which
        // pandas widens to float64 while Spark writes int64 — the
        // driver's strict dtype gate flags that as a hash mismatch.
        "s AS (SELECT user_id, ts, " +
        "CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM g) " +
        "SELECT user_id, sid, count(*) AS n_events, " +
        "min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS last_us " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, sid"),
    "stream_watermark_late" ->
      ("SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us " +
        "FROM events " +
        "WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE " +
        "ORDER BY event_id"),
    "stream_dedup_state" ->
      ("SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us " +
        "FROM events ORDER BY event_id"),
    // the foreachBatch sink lands exactly the orders table, so the
    // read-back aggregate is oracle-checkable
    "stream_foreachbatch_sink" ->
      ("SELECT o_orderstatus, count(*) AS n FROM orders " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")
  )
}
