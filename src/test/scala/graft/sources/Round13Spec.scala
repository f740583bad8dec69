package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{GraftSuite, Staging, Tables}

/** Round-13 regression tests — one per advisor/verdict finding fixed
  * this round:
  *
  *  - TIMESTAMP zone-map pruning must not prune files whose stats were
  *    rendered under a DIFFERENT session timezone than the scan's
  *    literal rendering (r12 ADVICE, medium): the write zone is now
  *    recorded per manifest entry ([[Gvt.GvtFile.tz]]) and
  *    [[Gvt.zSurvives]] applies zone-sensitive bounds only on a
  *    provable match.
  *  - Stream alignment must survive a column-rename CYCLE between the
  *    stream's start state and a served version (r12 ADVICE, low): both
  *    rename folds are now single positional selects.
  *  - restore() must roll back the stats clustering declaration with
  *    the rest of the metadata (r12 ADVICE, low).
  */
class Round13Spec extends GraftSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // zone guard — unit level (package access to the private rule)
  // ------------------------------------------------------------------

  private def tsFile(tz: String) = Gvt.GvtFile("data/c1-x/f.parquet", 1L,
    min = Map("ts" -> "1995-01-01 00:00:00"),
    max = Map("ts" -> "1995-12-31 23:59:59"), tz = tz)

  // a bound that provably misses the file's 1995 box
  private val missBound = Gvt.ZBound("ts",
    lo = Some("1996-01-01 00:00:00"), hi = None,
    kind = Gvt.ZKind.Chrono, zoned = true)

  test("zoned bounds prune only files with a provably matching write zone") {
    // matching zone (exact and alias-equivalent): the miss prunes
    assert(!Gvt.zSurvives(tsFile("UTC"), Seq(missBound), "UTC"))
    assert(!Gvt.zSurvives(tsFile("Etc/UTC"), Seq(missBound), "UTC"))
    // cross-zone: NEVER pruned by a zoned bound, however hard the miss
    assert(Gvt.zSurvives(tsFile("America/New_York"), Seq(missBound), "UTC"))
    // unrecorded write zone (pre-r13 manifest): kept
    assert(Gvt.zSurvives(tsFile(null), Seq(missBound), "UTC"))
    // unknown scan zone: kept
    assert(Gvt.zSurvives(tsFile("UTC"), Seq(missBound), null))
    // an UNzoned chrono bound (DATE/NTZ rendering — zone-free on both
    // sides) prunes regardless of the recorded zone
    val dateBound = missBound.copy(zoned = false)
    assert(!Gvt.zSurvives(tsFile("America/New_York"), Seq(dateBound), "UTC"))
    // a DST zone never admits zoned pruning even when writer ≡ reader:
    // wall-clock renderings are non-monotonic across a fall-back
    // transition, so the stat strings do not bound the file (r13
    // review finding)
    assert(Gvt.zSurvives(tsFile("America/New_York"), Seq(missBound),
      "America/New_York"))
  }

  test("UPDATE with a higher-order function falls to the stock refusal") {
    val dir = Staging.tempDir("r13_hof")
    val t = s"gvt.`$dir`"
    spark.sql(s"CREATE TABLE $t (k BIGINT, arr ARRAY<BIGINT>)")
    spark.sql(s"INSERT INTO $t SELECT id, array(id, id + 1) FROM range(0, 5)")
    val head = Gvt.latestVersion(dir)
    // a resolved LambdaFunction has no parseable .sql rendering — the
    // rule must leave it for the stock loud error, not crash at run()
    intercept[Exception] {
      spark.sql(s"UPDATE $t SET arr = transform(arr, x -> x + 1) WHERE k = 1")
    }
    assert(Gvt.latestVersion(dir) == head,
      "a refused HOF UPDATE must leave the table untouched")
  }

  test("a serialized txn writing one table twice refuses upfront") {
    val coord = Staging.tempDir("r13_sertxn_dup")
    val fact = s"$coord/fact"
    val e = intercept[IllegalArgumentException] {
      GvtTxn.commitSerialized(spark, coord, Seq(fact),
        _ => Seq(
          (fact, Seq(1L).toDF("k"), Seq("k")),
          (fact, Seq(2L).toDF("k"), Seq("k"))), staleMs = 500L)
    }
    assert(e.getMessage.contains("at most once"))
  }

  test("TIMESTAMP stats are zone-free epoch micros; nothing stamps tz") {
    // r13 stamped the write session zone on TIMESTAMP-statted files and
    // guarded pruning on a provable zone match; r14 removes the
    // narrowing structurally — the stat IS the instant (UTC epoch
    // micros), so no write is zone-dependent and no stamp is needed
    // (GvtFile.tz remains only for pre-r14 manifests)
    val tsDir = Staging.tempDir("r13_tzstamp_ts")
    Gvt.append(spark, tsDir,
      Tables(spark, sf0001, "orders").limit(100)
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp")),
      Seq("o_orderdate"))
    Gvt.snapshot(tsDir).foreach { f =>
      assert(f.tz == null,
        "epoch-micros stats are zone-free — no stamp expected")
      assert(f.min.get("o_orderdate").exists(_.matches("-?\\d+")) &&
        f.max.get("o_orderdate").exists(_.matches("-?\\d+")),
        s"TIMESTAMP stats must be epoch micros, got ${f.min} / ${f.max}")
    }
    val numDir = Staging.tempDir("r13_tzstamp_num")
    Gvt.append(spark, numDir,
      Tables(spark, sf0001, "orders").limit(100), Seq("o_orderkey"))
    assert(Gvt.snapshot(numDir).forall(_.tz == null),
      "zone-independent stats must not carry a zone stamp")
  }

  test("connector TIMESTAMP read stays correct under a shifted scan zone") {
    // two hourly tiles straddling 1996-01-01 UTC, statted as a genuine
    // TimestampType column under the UTC write session
    val dir = Staging.tempDir("r13_tzshift")
    def tile(day: String): Unit = Gvt.append(spark, dir,
      (0 until 24).map(h => f"$day $h%02d:00:00").toDF("s")
        .select(col("s").cast("timestamp").as("ts")).repartition(1),
      Seq("ts"))
    tile("1995-12-31")
    tile("1996-01-01")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // scan from UTC+5:30: the literal's instant is 1995-12-31 18:30Z,
      // so the 1995-12-31 tile CONTAINS matches (19:00Z..23:00Z) while
      // its UTC-rendered stat box ("...23:00:00" < "1996-01-01
      // 00:00:00") looks like a miss against the Kolkata-rendered
      // literal — the exact silent-wrong-results shape the zone guard
      // closes (pre-fix: connector returned 24 rows, not 29)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      def cnt(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("ts") >= lit("1996-01-01 00:00:00").cast("timestamp"))
        .count()
      val viaConnector = cnt(spark.read.format("gvt")
        .option("path", dir).load())
      val viaLibrary = cnt(Gvt.read(spark, dir))
      assert(viaConnector == 29L && viaLibrary == 29L,
        s"cross-zone scan diverged: connector=$viaConnector " +
          s"library=$viaLibrary (expected 29)")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  // ------------------------------------------------------------------
  // rename-cycle stream alignment
  // ------------------------------------------------------------------

  /** A strict a↔b cycle is unconstructible (renameColumn refuses a
    * logical name that is another column's PHYSICAL slot — verified
    * below), but the chained-rename collision the r12 advisor flagged
    * is still reachable: start the stream under a renamed state, then
    * move the start name onto a DIFFERENT column. The version-local →
    * start-name map then contains m→x AND x→y, and a fold order that
    * applies m→x first captures both columns. */

  test("renameColumn refuses a name that is another column's physical slot") {
    val dir = Staging.tempDir("r13_noswap")
    Gvt.append(spark, dir, Seq((1L, 10L, 1000L)).toDF("k", "a", "b"), Seq("k"))
    Gvt.renameColumn(spark, dir, "a", "tmp_swap")
    val e = intercept[IllegalArgumentException] {
      Gvt.renameColumn(spark, dir, "b", "a") // 'a' = tmp_swap's phys slot
    }
    assert(e.getMessage.contains("physical"))
  }

  test("append stream binds data correctly through colliding mid-stream renames") {
    val dir = Staging.tempDir("r13_cycle")
    Gvt.append(spark, dir,
      Seq((1L, 10L, 1000L)).toDF("k", "a", "b"), Seq("k"))
    Gvt.renameColumn(spark, dir, "a", "m") // stream start state: (k, m, b)
    val q = spark.readStream.format("graft.sources.GvtStreamSource")
      .option("skipChangeCommits", "true") // renames are schema commits
      .load(dir)
      .agg(sum("m").as("sm"), sum("b").as("sb"))
      .writeStream
      .option("checkpointLocation", Staging.fastTempDir("r13_cycle_ckpt"))
      .format("memory").queryName("r13_cycle_sink").outputMode("complete")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      Gvt.drainBounded(q)
      // mid-stream: free the start name m, then move it onto column b
      Gvt.renameColumn(spark, dir, "m", "n") // phys a: logical n
      Gvt.renameColumn(spark, dir, "b", "m") // phys b: logical m
      // head-logical (k, n, m) = physical (k, a, b): this row stores
      // 20 in physical a and 2000 in physical b
      Gvt.append(spark, dir,
        Seq((2L, 20L, 2000L)).toDF("k", "n", "m"), Seq("k"))
      Gvt.drainBounded(q)
      val r = spark.table("r13_cycle_sink").head
      // the stream's fixed names bind by PHYSICAL identity: stream-m is
      // physical a (10 + 20), stream-b physical b (1000 + 2000). The
      // pre-fix chained rename (n→m, then m→b) captured BOTH columns
      // named m on the second hop.
      assert((r.getLong(0), r.getLong(1)) == ((30L, 3000L)),
        s"colliding renames mis-bound the stream: $r")
    } finally q.stop()
  }

  test("cdc alignment survives colliding renames (diff path)") {
    val dir = Staging.tempDir("r13_cycle_cdc")
    Gvt.append(spark, dir,
      Seq((1L, 10L, 1000L)).toDF("k", "a", "b"), Seq("k")) // v0
    Gvt.renameColumn(spark, dir, "a", "m")                 // v1
    // stream fixed at (k, m, b): m = phys a, b = phys b
    val q = spark.readStream.format("graft.sources.GvtStreamSource")
      .option("mode", "cdc").option("startingVersion", "1")
      .option("maxVersionsPerBatch", "16")
      .load(dir)
      .groupBy("change_type")
      .agg(sum("m").as("sm"), sum("b").as("sb"))
      .writeStream
      .option("checkpointLocation", Staging.fastTempDir("r13_cyclecdc_ckpt"))
      .format("memory").queryName("r13_cyclecdc_sink").outputMode("complete")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      Gvt.drainBounded(q)
      // mid-stream: free the start name m, then move it onto column b
      Gvt.renameColumn(spark, dir, "m", "n")               // v2
      Gvt.renameColumn(spark, dir, "b", "m")               // v3
      Gvt.append(spark, dir,
        Seq((2L, 20L, 2000L)).toDF("k", "n", "m"), Seq("k")) // v4
      Gvt.drainBounded(q)
      // the v4 diff speaks (k, n, m); its alignment map is n→m AND
      // m→b — the exact capture shape: the pre-fix fold's first hop
      // (n→m) created a duplicate m that the second hop renamed
      // wholesale. stream-m sums physical-a values (10 + 20),
      // stream-b physical-b (1000 + 2000).
      val r = spark.table("r13_cyclecdc_sink")
        .filter(col("change_type") === "insert").head
      assert((r.getLong(1), r.getLong(2)) == ((30L, 3000L)),
        s"cdc colliding renames mis-bound: $r")
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // per-task DV fetch (the scale regime of the MoR connector read)
  // ------------------------------------------------------------------

  test("per-task DV fetch serves the same rows as the broadcast map") {
    val dir = Staging.tempDir("r13_dvfetch")
    // several files (8 range tiles), TWO dv commits so one file's
    // positions span sidecar dirs
    (0 until 8).foreach { i =>
      Gvt.append(spark, dir,
        (i * 1000L until (i + 1) * 1000L).map(k => (k, k * 3))
          .toDF("k", "v").repartition(1), Seq("k"))
    }
    Gvt.deleteWhereDV(spark, dir, col("k") % 3 === 0)
    Gvt.deleteWhereDV(spark, dir, col("k") % 5 === 0)
    def readAll() = spark.read.format("gvt").option("path", dir).load()
      .agg(count(lit(1)), sum("v")).head
    val viaBroadcast = readAll()
    try {
      // 0 forces the per-task regime at any size — the scale path
      // proven equal on the exact same snapshot
      spark.conf.set("spark.graft.gvt.dvBroadcastMaxRows", "0")
      val viaFetch = readAll()
      assert(viaFetch == viaBroadcast,
        s"per-task DV fetch diverged: $viaFetch vs $viaBroadcast")
      // and a filtered read (zone-map prune composes with task fetch)
      val filtered = spark.read.format("gvt").option("path", dir).load()
        .filter(col("k") >= 2000 && col("k") < 3000)
        .agg(count(lit(1))).head.getLong(0)
      assert(filtered == (2000L until 3000L)
        .count(k => k % 3 != 0 && k % 5 != 0).toLong)
    } finally spark.conf.unset("spark.graft.gvt.dvBroadcastMaxRows")
    val expected = (0L until 8000L).filter(k => k % 3 != 0 && k % 5 != 0)
    assert(viaBroadcast.getLong(0) == expected.size.toLong &&
      viaBroadcast.getLong(1) == expected.map(_ * 3).sum)
  }

  // ------------------------------------------------------------------
  // coordinator-serialized overlapping transactions
  // ------------------------------------------------------------------

  test("commitSerialized: overlapping txns are whole at EVERY doc") {
    val coord = Staging.tempDir("r13_sertxn")
    val fact = s"$coord/fact"
    val sum = s"$coord/summary"
    // each txn: 10 fact rows + 1 summary row, one tag — the per-doc
    // invariant is rows(fact) == 10 × rows(summary) and matching tag
    // sets, which plain commit() cannot promise under an overlapping
    // race (the narrowed r12 contract) and commitSerialized must
    def txn(tag: Int): Unit = {
      GvtTxn.commitSerialized(spark, coord, Seq(fact, sum),
        _ => Seq(
          (fact, spark.range(tag * 10L, tag * 10L + 10L).toDF("k")
            .withColumn("tag", lit(tag)), Seq("k")),
          (sum, Seq(tag).toDF("tag"), Seq("tag"))),
        staleMs = 2000L)
      ()
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        try (0 until 3).foreach(i => txn(w * 100 + i))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"serialized writers failed: ${errs.peek()}")
    val head = GvtTxn.latestVersion(coord)
    assert(head >= 5, s"expected ≥6 docs, head=$head")
    (0 to head).foreach { v =>
      val f = GvtTxn.read(spark, coord, fact, Some(v))
      val s = GvtTxn.read(spark, coord, sum, Some(v))
      val fTags = f.select("tag").distinct().collect()
        .map(_.getInt(0)).toSet
      val sTags = s.collect().map(_.getInt(0)).toSet
      assert(fTags == sTags,
        s"doc $v HALF-EXPOSED a txn: fact=$fTags summary=$sTags")
      assert(f.count() == 10L * s.count(),
        s"doc $v inconsistent: ${f.count()} fact rows, ${s.count()} txns")
    }
    // the head doc holds all six whole transactions
    assert(GvtTxn.read(spark, coord, sum).count() == 6)
  }

  test("commitSerializedOps: merge + delete land as ONE serialized txn") {
    val coord = Staging.tempDir("r13_serops")
    val fact = s"$coord/fact"
    val sum = s"$coord/summary"
    GvtTxn.commitSerialized(spark, coord, Seq(fact, sum),
      _ => Seq(
        (fact, (0L until 10L).map(k => (k, k)).toDF("k", "v"), Seq("k")),
        (sum, Seq(1, 2, 3).toDF("tag"), Seq("tag"))), staleMs = 500L)
    // a general op txn: upsert the fact, delete from the summary —
    // two different single-commit ops under one doc, each carrying the
    // attempt's authorship token
    GvtTxn.commitSerializedOps(spark, coord, Seq(fact, sum),
      (_, token) => Seq(
        fact -> (() => Gvt.merge(spark, fact,
          (5L until 15L).map(k => (k, k * 100)).toDF("k", "v"),
          "k", Seq("k"), txn = token)),
        sum -> (() => Gvt.delete(spark, sum, col("tag") === 2,
          Seq("tag"), txn = token))), staleMs = 500L)
    val f = GvtTxn.read(spark, coord, fact).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f.size == 15 &&
      (0L until 5L).forall(k => f(k) == k) &&
      (5L until 15L).forall(k => f(k) == k * 100),
      s"ops txn mis-applied: $f")
    assert(GvtTxn.read(spark, coord, sum).collect()
      .map(_.getInt(0)).toSet == Set(1, 3))
    // a NO-OP op (delete matching nothing commits no version) is
    // contiguous: the txn still links, the other side still lands
    GvtTxn.commitSerializedOps(spark, coord, Seq(fact, sum),
      (_, token) => Seq(
        fact -> (() => Gvt.delete(spark, fact, col("k") < 0, Seq("k"),
          txn = token)),
        sum -> (() => Gvt.appendTxn(spark, sum, Seq(4).toDF("tag"),
          Seq("tag"), token).get)), staleMs = 500L)
    assert(GvtTxn.read(spark, coord, fact).count() == 15)
    assert(GvtTxn.read(spark, coord, sum).collect()
      .map(_.getInt(0)).toSet == Set(1, 3, 4))
  }

  test("authorship: a foreign commit under a no-op op never gets pinned") {
    val coord = Staging.tempDir("r13_serauth")
    val fact = s"$coord/fact"
    val sum = s"$coord/summary"
    GvtTxn.commitSerialized(spark, coord, Seq(fact, sum),
      _ => Seq(
        (fact, Seq((1L, 1L)).toDF("k", "v"), Seq("k")),
        (sum, Seq(1).toDF("tag"), Seq("tag"))), staleMs = 500L)
    // the race shape version numbers alone cannot distinguish: a
    // FOREIGN append (a crashed peer, simulated on the first attempt
    // only) lands between the settled walk and this txn's op; the op
    // itself matches nothing, so it returns the FOREIGN head version.
    // Pre-token, contiguity (v == startHead + 1) accepted it and the
    // doc pinned the peer's half-transaction.
    var injected = false
    GvtTxn.commitSerializedOps(spark, coord, Seq(fact, sum),
      (_, token) => Seq(
        fact -> (() => {
          if (!injected) {
            injected = true
            Gvt.append(spark, fact, Seq((999L, 999L)).toDF("k", "v"),
              Seq("k")) // the foreign half-txn (no doc will pin it)
          }
          Gvt.delete(spark, fact, col("k") < 0, Seq("k"), txn = token)
        }),
        sum -> (() => Gvt.appendTxn(spark, sum, Seq(2).toDF("tag"),
          Seq("tag"), token).get)), staleMs = 500L)
    // the txn landed (retried past the injected foreign commit, which
    // the staleness walk rolled back) and NO doc version ever exposes
    // the foreign row
    val head = GvtTxn.latestVersion(coord)
    (0 to head).foreach { v =>
      val doc = GvtTxn.pins(coord, v)
      doc.get(fact).foreach { fv =>
        assert(Gvt.read(spark, fact, Some(fv))
          .filter(col("k") === 999L).count() == 0,
          s"doc $v pinned the foreign half-transaction (fact@$fv)")
      }
    }
    assert(GvtTxn.read(spark, coord, sum).collect()
      .map(_.getInt(0)).toSet == Set(1, 2))
    assert(GvtTxn.read(spark, coord, fact).count() == 1)
  }

  test("commitSerialized rolls back a crashed half-transaction") {
    val coord = Staging.tempDir("r13_sertxn_crash")
    val fact = s"$coord/fact"
    val sum = s"$coord/summary"
    GvtTxn.commitSerialized(spark, coord, Seq(fact, sum),
      _ => Seq(
        (fact, spark.range(0L, 10L).toDF("k").withColumn("tag", lit(1)),
          Seq("k")),
        (sum, Seq(1).toDF("tag"), Seq("tag"))), staleMs = 500L)
    // the crash: a fact append lands, its doc never links
    Gvt.append(spark, fact,
      spark.range(100L, 110L).toDF("k").withColumn("tag", lit(99)),
      Seq("k"))
    // the next serialized txn must restore the poison away and land
    GvtTxn.commitSerialized(spark, coord, Seq(fact, sum),
      _ => Seq(
        (fact, spark.range(10L, 20L).toDF("k").withColumn("tag", lit(2)),
          Seq("k")),
        (sum, Seq(2).toDF("tag"), Seq("tag"))), staleMs = 500L)
    val tags = GvtTxn.read(spark, coord, fact)
      .select("tag").distinct().collect().map(_.getInt(0)).toSet
    assert(tags == Set(1, 2),
      s"poison half-txn leaked into the serialized view: $tags")
    assert(GvtTxn.read(spark, coord, fact).count() == 20)
    // history preserved: the poison version still time-travels
    assert(Gvt.read(spark, fact, Some(1)).filter(col("tag") === 99)
      .count() == 10)
  }

  // ------------------------------------------------------------------
  // restore rolls back the stats declaration
  // ------------------------------------------------------------------

  test("restore rolls the stats clustering declaration back with the data") {
    val dir = Staging.tempDir("r13_restore_stats")
    Gvt.append(spark, dir, Seq((1L, 2L)).toDF("k", "v"), Seq("k")) // v0
    Gvt.setStats(spark, dir, Seq("v"))                             // v1
    assert(Gvt.mappingAt(dir).statsList == Seq("v"))
    val v = Gvt.restore(spark, dir, 0)
    assert(v > 1, "a stats-only divergence must still be a restore commit")
    assert(Gvt.mappingAt(dir).statsList.isEmpty,
      "restore must roll back the stats declaration (r12 advisor)")
    // and restoring forward again reinstates it
    Gvt.restore(spark, dir, 1)
    assert(Gvt.mappingAt(dir).statsList == Seq("v"))
  }
}
