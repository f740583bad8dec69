package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Ev, StreamingDemos}

/** MemoryStream-driven tests for the true streaming surface (no oracle:
  * watermarks/state have no batch-SQL equivalent). processAllAvailable
  * makes every micro-batch deterministic.
  */
class StreamingSpec extends GraftSuite {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long = 1,
      typ: String = "click"): Ev =
    Ev(id, Timestamp.valueOf(t), user, typ, 1.0)

  test("windowed counts match batch aggregation (complete mode)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingDemos.windowedCounts(in.toDF)
      .writeStream.format("memory").queryName("wc_complete")
      .outputMode("complete").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:55:00"),
        ev(3, "2024-01-01 11:05:00"))
      q.processAllAvailable()
      val got = spark.table("wc_complete")
        .orderBy("start_us").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
      val h11 = Timestamp.valueOf("2024-01-01 11:00:00").getTime * 1000L
      assert(got == Seq((h10, 2L), (h11, 1L)))
    } finally q.stop()
  }

  test("watermark drops late rows in append mode") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingDemos.windowedCounts(in.toDF)
      .writeStream.format("memory").queryName("wc_append")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      in.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // this row is 100+ min behind the watermark -> must be dropped
      in.addData(ev(4, "2024-01-01 10:15:00"))
      q.processAllAvailable()
      in.addData(ev(5, "2024-01-01 13:30:00"))
      q.processAllAvailable()
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
      val n10 = spark.table("wc_append")
        .filter(col("start_us") === h10).collect()
      assert(n10.length == 1 && n10.head.getLong(2) == 2L,
        s"late row not dropped: ${n10.mkString(",")}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingDemos.dedupWithinWatermark(in.toDF)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"))
      q.processAllAvailable()
      in.addData(ev(1, "2024-01-01 10:01:00"), ev(2, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingDemos.runningCountPerUser(in.toDS)
      .writeStream.format("memory").queryName("running_counts")
      .outputMode("update").start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", user = 7),
        ev(2, "2024-01-01 10:01:00", user = 7))
      q.processAllAvailable()
      in.addData(ev(3, "2024-01-01 10:02:00", user = 7),
        ev(4, "2024-01-01 10:03:00", user = 8))
      q.processAllAvailable()
      val last = spark.table("running_counts").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
      assert(last == Map(7L -> 3L, 8L -> 1L))
    } finally q.stop()
  }

  test("streaming session windows close after the watermark passes") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = streaming.StreamingDemos.sessionCounts(in.toDF)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      // 2+ hours later: watermark sails past session end -> session emits
      in.addData(ev(3, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      in.addData(ev(4, "2024-01-01 15:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sessions_stream").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(rows.contains((1L, 2L)), s"first session not emitted: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = streaming.StreamingDemos.sessionize(in.toDS)
      .writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode("append").start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", user = 5),
        ev(2, "2024-01-01 10:05:00", user = 5))
      q.processAllAvailable()
      // 31-min gap within one user's stream -> first session closes
      in.addData(ev(3, "2024-01-01 10:40:00", user = 5))
      q.processAllAvailable()
      val closed = spark.table("fmgws_sessions")
        .filter(col("closed") === true).collect()
        .map(r => (r.getLong(0), r.getLong(3)))
      assert(closed.contains((5L, 2L)),
        s"gap-closed session missing: ${closed.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream join matches purchases to in-window signups only") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = streaming.StreamingDemos.purchaseAfterSignup(in.toDF)
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1, typ = "signup"),
        ev(2, "2024-01-01 10:30:00", user = 1, typ = "purchase"),
        ev(3, "2024-01-01 09:30:00", user = 2, typ = "signup"),
        ev(4, "2024-01-01 12:00:00", user = 2, typ = "purchase"),
        ev(5, "2024-01-01 11:00:00", user = 3, typ = "purchase"))
      q.processAllAvailable()
      val got = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // only user 1's purchase has a signup within the preceding hour
      assert(got == Set((2L, 1L)), s"got ${got.mkString(",")}")
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch against the dim, " +
      "stateless, and matches the batch-emulated key") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val q = StreamingDemos.enrichBySegment(in.toDF, dim)
      .writeStream.format("memory").queryName("ss_static")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1),
        ev(2, "2024-01-01 10:01:00", user = 2),
        ev(3, "2024-01-01 10:02:00", user = 99)) // no dim row -> dropped
      q.processAllAvailable()
      // a SECOND batch joins statelessly — same keys enrich again (no
      // dedup state, no watermark: pure per-batch probe)
      in.addData(ev(4, "2024-01-01 11:00:00", user = 1))
      q.processAllAvailable()
      val got = spark.table("ss_static").collect()
        .map(r => (r.getLong(0), r.getString(3))).toSet
      assert(got == Set((1L, "BUILDING"), (2L, "MACHINERY"),
        (4L, "BUILDING")), s"got ${got.mkString(",")}")
    } finally q.stop()
    // fixture parity: the registry key's rollup equals a plain SQL join
    val key = streaming.EventOps.streamStaticJoin(spark, sf0001)
    val direct = spark.sql(
      """SELECT c.c_mktsegment AS segment, e.event_type,
        |count(*) AS n_events,
        |sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS sum_cents
        |FROM parquet.`""".stripMargin.replaceAll("\n", " ") + sf0001 +
        """/events.parquet` e JOIN parquet.`""" + sf0001 +
        """/customer.parquet` c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replaceAll("\n", " "))
    assert(key.collect().toSeq == direct.collect().toSeq)
  }

  test("batch session_window agrees with gaps-and-islands sessionization") {
    val a = streaming.EventOps.session(spark, sf0001)
    val b = streaming.EventOps.sessionizeSql(spark, sf0001)
    assert(a.count() == b.count())
    val aAgg = a.agg(sum("n_events")).head.getLong(0)
    val bAgg = b.agg(sum("n_events")).head.getLong(0)
    assert(aAgg == bAgg)
  }

  test("checkpointed file stream processes only NEW files on the next run") {
    // the incremental-ingest contract: a second Trigger.AvailableNow run
    // against the same checkpoint resumes from the stored offsets, so
    // already-seen input files are never reprocessed (exactly-once at the
    // file granularity)
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_inc_in").toString
    val out = Files.createTempDirectory("graft_inc_out").toString
    val ckpt = Files.createTempDirectory("graft_inc_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("v LONG")
        .json(in)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.write(Paths.get(in, "a.json"), "{\"v\":1}\n{\"v\":2}\n".getBytes)
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    Files.write(Paths.get(in, "b.json"), "{\"v\":3}\n".getBytes)
    runOnce()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3, "second run must append ONLY the new file")
    assert(rows.agg(sum("v")).head.getLong(0) == 6)
  }

  test("custom V2 replay source paces one file per micro-batch") {
    import java.nio.file.{Files, Paths}
    val dir = Staging.tempDir("graft_replay_spec")
    for (b <- 0 until 3) {
      val lines = (0 until 5).map(i => f"${b * 5 + i}%-8d").mkString("\n")
      Files.write(Paths.get(dir, f"batch-$b%02d.txt"), (lines + "\n").getBytes)
    }
    val name = "graft_replay_spec_sink"
    val q = spark.readStream
      .format("graft.sources.FixedWidthReplaySource")
      .option("fields", "v:1:8:long")
      .load(dir)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // ReadLimit.maxFiles(1): the 3-file manifest must drain in exactly
    // 3 non-empty micro-batches, in file order
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length === 3, batches.map(_.numInputRows).toSeq)
    assert(batches.forall(_.numInputRows === 5))
    val got = spark.table(name).orderBy("v").collect().map(_.getLong(0))
    assert(got.toSeq === (0L until 15L))
  }

  test("custom V2 replay source: empty manifest terminates cleanly") {
    val dir = Staging.tempDir("graft_replay_empty")
    val name = "graft_replay_empty_sink"
    val q = spark.readStream
      .format("graft.sources.FixedWidthReplaySource")
      .option("fields", "v:1:8:long")
      .load(dir)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty)
    assert(spark.table(name).count() === 0)
  }
}
