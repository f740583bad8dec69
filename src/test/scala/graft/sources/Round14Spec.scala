package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{GraftSuite, Staging}

/** Round-14 regression tests — one per verdict rung / advisor finding
  * fixed this round:
  *
  *  - Coordinator-log checkpoint + vacuum (r13 verdict rung 1): txn
  *    docs carry per-transaction DELTA pins, the cumulative view is
  *    [[GvtTxn.pins]]'s anchor-plus-tail fold over a full-map
  *    checkpoint every [[GvtTxn.CheckpointEvery]] docs, and
  *    [[GvtTxn.vacuum]] reaps pre-checkpoint docs behind a recorded
  *    retention floor.
  *  - Mixed-era logs (pre-r14 cumulative docs + r14 delta docs) must
  *    resolve identically — max-merge is monotone over both shapes.
  */
class Round14Spec extends GraftSuite {

  private def docCount(txnDir: String): Int = {
    val ld = Paths.get(txnDir, "_gvt_txn")
    val s = Files.list(ld)
    try s.iterator().asScala.count(p =>
      p.getFileName.toString.matches(raw"\d{8}\.json"))
    finally s.close()
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  // 25 publishes over 3 tables: t0 pinned every doc, t1 every 2nd,
  // t2 every 5th — enough structure to catch a wrong fold anywhere
  private def seed(coord: String, n: Int = 25): Unit =
    (0 until n).foreach { i =>
      val pins = Map(s"$coord/t0" -> i) ++
        (if (i % 2 == 0) Map(s"$coord/t1" -> i) else Map.empty) ++
        (if (i % 5 == 0) Map(s"$coord/t2" -> i) else Map.empty)
      GvtTxn.publish(coord, pins)
    }

  private def expectedPins(coord: String, v: Int): Map[String, Int] =
    Map(s"$coord/t0" -> v,
      s"$coord/t1" -> (v - v % 2),
      s"$coord/t2" -> (v - v % 5))

  test("txn docs are deltas; pins folds the cumulative view") {
    val coord = Staging.tempDir("r14_txnlog")
    seed(coord)
    // each doc carries ONLY its own publish's pins
    assert(GvtTxn.docAt(coord, 7).tables == Map(s"$coord/t0" -> 7))
    assert(GvtTxn.docAt(coord, 10).tables ==
      Map(s"$coord/t0" -> 10, s"$coord/t1" -> 10, s"$coord/t2" -> 10))
    // the cumulative view is exact at every version
    (0 to 24).foreach { v =>
      assert(GvtTxn.pins(coord, v) == expectedPins(coord, v),
        s"pins($v) wrong")
    }
    // checkpoints landed at the cadence and carry the full map
    assert(Files.exists(
      Paths.get(coord, "_gvt_txn", "00000010.ckpt.json")))
    assert(Files.exists(
      Paths.get(coord, "_gvt_txn", "00000020.ckpt.json")))
    // a MISSING checkpoint only costs replay length, never correctness
    Files.delete(Paths.get(coord, "_gvt_txn", "00000020.ckpt.json"))
    assert(GvtTxn.pins(coord, 24) == expectedPins(coord, 24))
    assert(GvtTxn.tableVersion(coord, s"$coord/t2").contains(20))
  }

  test("txn vacuum reaps pre-floor docs behind a recorded floor") {
    val coord = Staging.tempDir("r14_txnvac")
    seed(coord)
    assert(docCount(coord) == 25)
    val deleted = GvtTxn.vacuum(coord, 20)
    assert(deleted >= 20, s"only $deleted docs reaped")
    assert(docCount(coord) == 5) // docs 20..24 retained
    assert(GvtTxn.vacuumFloor(coord) == 20)
    // resolution at and above the floor is exact
    (20 to 24).foreach { v =>
      assert(GvtTxn.pins(coord, v) == expectedPins(coord, v))
    }
    assert(GvtTxn.latestVersion(coord) == 24)
    assert(GvtTxn.tableVersion(coord, s"$coord/t1").contains(24))
    // below the floor fails LOUDLY, never silently wrong
    val e = intercept[IllegalArgumentException] { GvtTxn.pins(coord, 19) }
    assert(e.getMessage.contains("floor"))
    // idempotent: re-vacuum at/below the floor is a no-op
    assert(GvtTxn.vacuum(coord, 20) == 0)
    // and the log keeps working: new publishes + the next checkpoint
    (25 to 31).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t0" -> i)))
    assert(GvtTxn.pins(coord, 31) ==
      expectedPins(coord, 24) + (s"$coord/t0" -> 31))
    assert(Files.exists(
      Paths.get(coord, "_gvt_txn", "00000030.ckpt.json")))
  }

  test("txn vacuum writes an anchor checkpoint at a non-cadence floor") {
    val coord = Staging.tempDir("r14_txnvac_anchor")
    seed(coord)
    GvtTxn.vacuum(coord, 17) // no natural checkpoint at 17
    assert(Files.exists(
      Paths.get(coord, "_gvt_txn", "00000017.ckpt.json")))
    assert(GvtTxn.pins(coord, 17) == expectedPins(coord, 17))
    assert(GvtTxn.pins(coord, 24) == expectedPins(coord, 24))
  }

  test("pre-r14 cumulative docs and r14 delta docs fold identically") {
    val coord = Staging.tempDir("r14_txnmixed")
    val ld = Files.createDirectories(Paths.get(coord, "_gvt_txn"))
    // hand-write an old-era log: docs 0..11 carrying CUMULATIVE maps
    // (what pre-r14 publish max-merged forward), no checkpoints
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      .registerModule(
        new com.fasterxml.jackson.module.scala.DefaultScalaModule)
    (0 to 11).foreach { v =>
      val cumulative = expectedPins(coord, v)
      Files.write(ld.resolve(f"$v%08d.json"),
        mapper.writeValueAsBytes(GvtTxn.TxnDoc(v, cumulative, v + 1L)))
    }
    // new-era delta publishes continue the same log
    GvtTxn.publish(coord, Map(s"$coord/t1" -> 12))
    GvtTxn.publish(coord, Map(s"$coord/t0" -> 13))
    assert(GvtTxn.pins(coord, 11) == expectedPins(coord, 11))
    assert(GvtTxn.pins(coord, 13) == Map(s"$coord/t0" -> 13,
      s"$coord/t1" -> 12, s"$coord/t2" -> 10))
    // vacuuming a mixed-era log anchors correctly too
    GvtTxn.vacuum(coord, 12)
    assert(GvtTxn.pins(coord, 13) == Map(s"$coord/t0" -> 13,
      s"$coord/t1" -> 12, s"$coord/t2" -> 10))
  }

  // ------------------------------------------------------------------
  // DV auto-absorb policy (r13 verdict rung 3): deleteWhereDV triggers
  // absorbDeletes itself when a file's deleted fraction crosses
  // spark.graft.gvt.dvAbsorbRatio (default 0.5) — the MoR read tax is
  // bounded without operator memory.
  // ------------------------------------------------------------------

  import spark.implicits._

  private def dvTable(prefix: String): String = {
    val dir = Staging.tempDir(prefix)
    Gvt.append(spark, dir,
      spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 10).as("v")).repartition(1), Seq("k"))
    dir
  }
  private def vectored(dir: String): Boolean =
    Gvt.snapshot(dir).exists(f => f.dv != null && f.dv.nonEmpty)

  test("a delete crossing the ratio auto-absorbs; reads return to the " +
      "join-free fast path") {
    val dir = dvTable("r14_autoabsorb")
    // 30% deleted: under the 0.5 default — vectors must accumulate
    Gvt.deleteWhereDV(spark, dir, col("k") < 30)
    assert(vectored(dir), "under-threshold delete must stay MoR")
    // +31% = 61% deleted: the SAME call absorbs
    val v = Gvt.deleteWhereDV(spark, dir, col("k") >= 30 && col("k") < 61)
    assert(Gvt.commitAt(dir, v).op == "dv_delete")
    assert(Gvt.latestVersion(dir) == v + 1 &&
      Gvt.commitAt(dir, v + 1).op == "absorb",
      "threshold crossing must trigger the absorb commit")
    assert(!vectored(dir), "absorb must drop every vector")
    // the rewrite preserved the table's stat columns (zone maps intact)
    assert(Gvt.snapshot(dir).forall(f =>
      f.min.contains("k") && f.max.contains("k")),
      "auto-absorb rewrite lost the stat columns")
    // state exact, plan join-free
    assert(Gvt.read(spark, dir).orderBy("k").as[(Long, Long)].collect()
      .toSeq == (61L until 100L).map(k => (k, k * 10)))
    val plan = spark.read.format("gvt").option("path", dir).load()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      "post-absorb connector read must be the plain vectorized scan")
  }

  test("auto-absorb is configurable off and defers to transactions") {
    // disabled by config: vectors persist at any fraction
    val dir = dvTable("r14_autoabsorb_off")
    spark.conf.set("spark.graft.gvt.dvAbsorbRatio", "2.0")
    try {
      Gvt.deleteWhereDV(spark, dir, col("k") < 61)
      assert(vectored(dir), "disabled policy must leave the vectors")
    } finally spark.conf.unset("spark.graft.gvt.dvAbsorbRatio")
    // a TRANSACTIONAL delete (txn token — the serialized-ops path,
    // whose contiguity proof owns the version sequence) never absorbs
    val dir2 = dvTable("r14_autoabsorb_txn")
    val v = Gvt.deleteWhereDV(spark, dir2, col("k") < 61, txn = "tok-1")
    assert(Gvt.latestVersion(dir2) == v && vectored(dir2),
      "a transactional delete must defer maintenance to the caller")
  }

  // ------------------------------------------------------------------
  // UTC-epoch TIMESTAMP zone-map stats (r13 verdict rung 4): the stat
  // IS the instant, so pruning works in EVERY session zone — including
  // the DST zones the r13 fixed-offset guard had to decline.
  // ------------------------------------------------------------------

  private def fileScans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.datasources.v2.FileScan] = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan)
      .collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }
      .collect {
        case f: org.apache.spark.sql.execution.datasources.v2.FileScan => f
        case g: GvtScan => g.delegate
      }
  }

  private def nFilesRead(df: org.apache.spark.sql.DataFrame): Int =
    fileScans(df).map(_.toBatch.planInputPartitions()
      .map(_.asInstanceOf[
        org.apache.spark.sql.execution.datasources.FilePartition]
        .files.length).sum).sum

  test("DST-zone TIMESTAMP writes prune correctly (the r13 guard " +
      "declined them)") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // writer AND reader in America/New_York across the 1996-10-27
      // fall-back: wall-clock renderings are non-monotonic there, so
      // the r13 string-stat rule could never prune — epoch stats can
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val dir = Staging.tempDir("r14_dst")
      val zone = java.time.ZoneId.of("America/New_York")
      val start = java.time.ZonedDateTime
        .of(1996, 10, 26, 0, 0, 0, 0, zone).toInstant
      // 8 six-hour tiles = 48 hourly instants over the transition
      val all = (0 until 48).map(h => start.plusSeconds(h * 3600L))
      (0 until 8).foreach { i =>
        val rows = (0 until 6).map(h =>
          java.sql.Timestamp.from(all(i * 6 + h)))
        Gvt.append(spark, dir,
          rows.toDF("ts").repartition(1), Seq("ts"))
      }
      val (loS, hiS) = ("1996-10-27 00:30:00", "1996-10-27 12:30:00")
      def instant(s: String) = java.time.LocalDateTime
        .parse(s.replace(' ', 'T')).atZone(zone).toInstant
      val expected = all.count(t =>
        !t.isBefore(instant(loS)) && t.isBefore(instant(hiS)))
      val df = spark.read.format("gvt").option("path", dir).load()
        .filter(col("ts") >= lit(loS).cast("timestamp") &&
          col("ts") < lit(hiS).cast("timestamp"))
      assert(df.count() == expected,
        s"DST-zone scan wrong: ${df.count()} != $expected")
      val n = nFilesRead(df)
      assert(n <= 4 && n < 8,
        s"epoch stats must prune in a DST zone: read $n of 8 files")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("cross-zone TIMESTAMP scans now prune (r13 only kept them " +
      "correct)") {
    // writer UTC (the suite default), reader Asia/Kolkata — the r13
    // guard kept every file on the zone mismatch; epoch stats prune
    val dir = Staging.tempDir("r14_xzone")
    (0 until 8).foreach { i =>
      val rows = (0 until 24).map(h =>
        java.sql.Timestamp.from(java.time.Instant.parse(
          f"1996-01-0${i + 1}%dT$h%02d:00:00Z")))
      Gvt.append(spark, dir, rows.toDF("ts").repartition(1), Seq("ts"))
    }
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val df = spark.read.format("gvt").option("path", dir).load()
        .filter(col("ts") >= lit("1996-01-04 00:00:00").cast("timestamp") &&
          col("ts") < lit("1996-01-05 00:00:00").cast("timestamp"))
      // 1996-01-04 00:00 IST = 1996-01-03 18:30Z: spans tiles 3 and 4
      assert(df.count() == 24, s"cross-zone count ${df.count()} != 24")
      val n = nFilesRead(df)
      assert(n <= 2, s"cross-zone scan must prune: read $n of 8 files")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  // ------------------------------------------------------------------
  // r13 ADVICE regressions
  // ------------------------------------------------------------------

  test("merge fixture shift clears the live key space at 10^6 keys") {
    // keys 1..1,000,200: the historical fixed +1000000 shift lands
    // shifted insert keys (≡0 mod 100, so ≡0 mod 10) on live update
    // keys — merge's duplicate-source-key refusal threw. The
    // max-derived shift clears the live key space; the REAL fixture
    // runs end to end against a synthetic sf dir at that scale.
    val n = 1000200L
    val fakeSf = Staging.tempDir("r14_bigsf")
    spark.range(1, n + 1).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      (col("id") % 25).as("c_nationkey"),
      (col("id") % 1000).cast("double").as("c_acctbal"),
      lit("BUILDING").as("c_mktsegment"))
      .write.parquet(s"$fakeSf/customer.parquet")
    val out = GvtOps.mergeInto(spark, fakeSf)
    val agg = out.agg(count(lit(1)), countDistinct(col("c_custkey"))).head
    assert(agg.getLong(0) == n + n / 100,
      s"merged rows ${agg.getLong(0)} != ${n + n / 100}")
    assert(agg.getLong(1) == agg.getLong(0),
      "merge produced duplicate keys")
  }

  test("string merge keys prune in UTF8 order, never numerically") {
    import spark.implicits._
    val dir = Staging.tempDir("r14_strkey")
    // one file with keys {"10","9","5"}: string box ["10","9"], which
    // the numeric misread [10.0, 9.0] claims excludes source key "5" —
    // the file would be falsely pruned and the merge would DUPLICATE
    // the row instead of replacing it
    Gvt.append(spark, dir,
      Seq(("10", 1L), ("9", 2L), ("5", 3L)).toDF("k", "v")
        .repartition(1), Seq("k"))
    Gvt.merge(spark, dir,
      Seq(("5", 99L)).toDF("k", "v"), "k", Seq("k"))
    val rows = Gvt.read(spark, dir).as[(String, Long)].collect().sorted
    assert(rows.toSeq == Seq(("10", 1L), ("5", 99L), ("9", 2L)),
      s"string-key merge duplicated or lost a row: ${rows.toSeq}")
  }

  test("UPDATE SQL-text round-trip is verified at rewrite time") {
    val target = spark.range(1).select(col("id").as("v"),
      (col("id") * 2).as("w")).queryExecution.analyzed
    // resolvable text passes
    assert(RewriteGvtDml.roundTrips("`v` + 1", target))
    assert(RewriteGvtDml.roundTrips("CASE WHEN w > 0 THEN v ELSE 0 END",
      target))
    // unknown function / unknown column fall to the stock refusal
    assert(!RewriteGvtDml.roundTrips("definitely_not_a_fn(`v`)", target))
    assert(!RewriteGvtDml.roundTrips("`no_such_col` + 1", target))
    assert(!RewriteGvtDml.roundTrips("not ( parseable", target))
    // end to end: a registered ScalaUDF renders as `UDF:name(...)` —
    // text that can never re-parse — so pre-r14 it passed the rule and
    // crashed at run() with a parse error; the rewrite-time round-trip
    // now sends it to the upfront stock refusal with NOTHING committed
    spark.udf.register("r14_plus1", (x: Long) => x + 1)
    val dir = Staging.tempDir("r14_dmlrt")
    val t = s"gvt.`$dir`"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(0, 5)")
    val head = Gvt.latestVersion(dir)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = r14_plus1(v) WHERE k = 2")
    }
    assert(e.getMessage.contains("does not support UPDATE"),
      s"expected the stock loud refusal, got: ${e.getMessage}")
    assert(Gvt.latestVersion(dir) == head,
      "a refused UDF UPDATE must leave the table untouched")
    // ...while a plain expression UPDATE still commits (no over-refusal)
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 2")
    assert(spark.sql(s"SELECT v FROM $t WHERE k = 2").head.getLong(0) == 21L)
  }

  test("concurrent cold DV sidecar fetches stay consistent (lock-free " +
      "first touch)") {
    import spark.implicits._
    val dir = Staging.tempDir("r14_dvconc")
    spark.conf.set("spark.graft.gvt.dvAbsorbRatio", "2.0")
    try {
      (0 until 4).foreach { i =>
        Gvt.append(spark, dir,
          spark.range(i * 1000L, (i + 1) * 1000L).toDF("k")
            .repartition(1), Seq("k"))
      }
      Gvt.deleteWhereDV(spark, dir, col("k") % 3 === 0)
    } finally spark.conf.unset("spark.graft.gvt.dvAbsorbRatio")
    val files = Gvt.snapshot(dir)
    val dvDirs = files.flatMap(f => Option(f.dv).getOrElse(Nil)).distinct
    assert(dvDirs.nonEmpty)
    // 16 threads race the COLD first touch across different files —
    // the footer I/O runs outside the memo lock; every reader must see
    // the exact slice for ITS file (expected values computed AFTER the
    // race so the race itself hits the cold path)
    val results = new java.util.concurrent.ConcurrentHashMap[
      (String, Int), Seq[Long]]()
    val threads = (0 until 16).map { t =>
      new Thread(() => {
        val f = files(t % files.size)
        results.put((f.path, t),
          GvtDvFetch.positions(dir, dvDirs, f.path).toSeq)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(results.size() == 16, "a fetch thread hung or died")
    val expected = files.map(f => f.path ->
      GvtDvFetch.positions(dir, dvDirs, f.path).toSeq).toMap
    results.entrySet().forEach { e =>
      assert(e.getValue == expected(e.getKey._1),
        s"slice diverged for ${e.getKey._1}")
    }
  }

  test("snapshot resolution survives a concurrent vacuum (readdir-miss " +
      "retry)") {
    // a vacuum's unlinks can make a racing reader's directory listing
    // miss UNRELATED entries (POSIX readdir has no snapshot guarantee),
    // so the walk could anchor below the fresh floor checkpoint and
    // chase deleted docs into NoSuchFileException — found by the
    // cross-JVM smoke's rmw phase at r14 close. The walk now re-lists.
    import spark.implicits._
    val dir = Staging.tempDir("r14_vacrace")
    (0 until 24).foreach(i =>
      Gvt.append(spark, dir, Seq(i.toLong).toDF("k"), Seq("k")))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val readers = (0 until 4).map(_ => new Thread(() => {
      try while (!stop.get()) {
        assert(Gvt.snapshot(dir).size >= 24)
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }))
    readers.foreach(_.start())
    try (0 until 12).foreach { i =>
      Gvt.append(spark, dir, Seq((100 + i).toLong).toDF("k"), Seq("k"))
      Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    } finally { stop.set(true); readers.foreach(_.join(30000)) }
    assert(failure.get() == null,
      s"a racing reader threw: ${failure.get()}")
    assert(Gvt.read(spark, dir).count() == 36)
    // a PERMANENT hole (a mid-tail doc really gone, not a listing
    // miss) still fails loudly after the bounded retries
    (0 until 3).foreach(i =>
      Gvt.append(spark, dir, Seq((200 + i).toLong).toDF("k"), Seq("k")))
    val mid = Gvt.latestVersion(dir) - 1
    Files.delete(Paths.get(dir, Gvt.LogDir, f"$mid%08d.json"))
    intercept[java.nio.file.NoSuchFileException] { Gvt.snapshot(dir) }
  }

  test("a publish whose predecessor doc was vacuumed away still stamps") {
    // the ts stamp reads doc v-1 directly; a concurrent vacuum can
    // unlink it between the writer's base read and the stamp — the
    // stamp now falls back to the wall clock (still strictly monotone:
    // the vacuumed doc's ts came from the same clock in the past)
    import spark.implicits._
    val dir = Staging.tempDir("r14_stamprace")
    (0 until 3).foreach(i =>
      Gvt.append(spark, dir, Seq(i.toLong).toDF("k"), Seq("k")))
    Files.delete(Paths.get(dir, Gvt.LogDir, "00000001.json"))
    Files.delete(Paths.get(dir, Gvt.LogDir, "00000002.json"))
    // version 3 with doc 2 missing: pre-fix this threw NoSuchFile
    assert(Gvt.tryPublish(dir,
      Gvt.GvtCommit(3, "append", Nil, Nil), spark))
    assert(Gvt.commitAt(dir, 3).ts > 0L)
  }

  test("serialized txns stay whole across a coordinator vacuum") {
    val coord = Staging.tempDir("r14_txnvac_serial")
    val fact = s"$coord/fact"
    val sum = s"$coord/summary"
    import spark.implicits._
    def one(tag: Int): Unit = {
      GvtTxn.commitSerialized(spark, coord, Seq(fact, sum),
        _ => Seq(
          (fact, Seq(tag, tag).toDF("k"), Seq("k")),
          (sum, Seq(tag).toDF("tag"), Seq("tag"))),
        staleMs = 500L)
      ()
    }
    (0 until 12).foreach(one)
    GvtTxn.vacuum(coord, GvtTxn.latestVersion(coord) - 2)
    (12 until 15).foreach(one)
    assert(GvtTxn.read(spark, coord, fact).count() == 30)
    assert(GvtTxn.read(spark, coord, sum).collect()
      .map(_.getInt(0)).toSet == (0 until 15).toSet)
  }
}
