package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{GraftSuite, Staging}

/** Round-15 regression tests — one per r14 verdict rung / advisor
  * finding fixed this round:
  *
  *  - AUTO-VACUUM policy for the coordinator txn log
  *    (`spark.graft.gvt.txnRetain`): the publish path itself bounds
  *    the retained span to [R, 2R] with no manual vacuum, below-floor
  *    reads keep failing loudly, and the policy is OFF by default.
  *  - Checkpoint cadence knobs (`spark.graft.gvt.checkpointEvery` /
  *    `...txnCheckpointEvery`): non-default cadences keep resolution
  *    and vacuum exact; malformed values fail BEFORE the commit point.
  *  - Observable maintenance swallows ([[GvtMaintenance]]): injected
  *    checkpoint/absorb failures leave the committed op intact, bump
  *    the counter, and the cadence RESUMES once the fault clears.
  *  - ADVICE r14: deleteWhereDV's absorb trigger catches NonFatal (a
  *    committed delete never looks failed); the serialized stale-wait
  *    doc walk ([[GvtTxn.pinRaisedIn]]) survives a concurrent vacuum
  *    reaping the walked range.
  */
class Round15Spec extends GraftSuite {

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  private def docCount(txnDir: String): Int = {
    val ld = Paths.get(txnDir, "_gvt_txn")
    val s = Files.list(ld)
    try s.iterator().asScala.count(p =>
      p.getFileName.toString.matches(raw"\d{8}\.json"))
    finally s.close()
  }

  private def withConf[A](kvs: (String, String)*)(body: => A): A =
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }

  // ---- auto-vacuum policy ----------------------------------------

  test("txnRetain policy bounds the retained span with no manual vacuum") {
    val coord = Staging.tempDir("r15_autovac")
    withConf("spark.graft.gvt.txnRetain" -> "4") {
      (0 until 14).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    }
    // hysteresis trace: span crosses 2R=8 at doc 8 (floor 0→4) and at
    // doc 12 (floor 4→8); docs 13 leaves the span at 5 < 8
    assert(GvtTxn.vacuumFloor(coord) == 8)
    assert(GvtTxn.latestVersion(coord) == 13)
    assert(docCount(coord) == 6, "docs 8..13 retained")
    // the contract window [head−R, head] resolves exactly
    (9 to 13).foreach { v =>
      assert(GvtTxn.pins(coord, v) == Map(s"$coord/t" -> v), s"pins($v)")
    }
    // the floor itself resolves (vacuum wrote its anchor checkpoint)
    assert(GvtTxn.pins(coord, 8) == Map(s"$coord/t" -> 8))
    // below-floor time travel fails loudly, never silently-empty
    val e = intercept[IllegalArgumentException](GvtTxn.pins(coord, 7))
    assert(e.getMessage.contains("vacuumed"))
    // the log keeps working after the policy ran
    assert(GvtTxn.publish(coord, Map(s"$coord/t" -> 99)) == 14)
    assert(GvtTxn.tableVersion(coord, s"$coord/t").contains(99))
  }

  test("auto-vacuum is OFF by default — unset knob reaps nothing") {
    val coord = Staging.tempDir("r15_novac")
    (0 until 25).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    assert(GvtTxn.vacuumFloor(coord) == 0)
    assert(docCount(coord) == 25)
    assert(GvtTxn.pins(coord, 0) == Map(s"$coord/t" -> 0))
  }

  test("serialized commits run the same policy") {
    val coord = Staging.tempDir("r15_autovac_ser")
    val t = s"$coord/fact"
    withConf("spark.graft.gvt.txnRetain" -> "2") {
      (0 until 9).foreach { i =>
        GvtTxn.commitSerialized(spark, coord, Seq(t),
          _ => Seq((t, spark.range(i, i + 1).toDF("k"), Seq("k"))),
          staleMs = 1000L)
      }
    }
    // crossings at docs 4 (floor 0→2), 6 (→4), 8 (→6)
    assert(GvtTxn.vacuumFloor(coord) == 6)
    assert(GvtTxn.read(spark, coord, t).count() == 9)
    intercept[IllegalArgumentException](GvtTxn.pins(coord, 1))
  }

  test("malformed txnRetain fails BEFORE the doc link") {
    val coord = Staging.tempDir("r15_badknob")
    GvtTxn.publish(coord, Map(s"$coord/t" -> 0))
    withConf("spark.graft.gvt.txnRetain" -> "banana") {
      intercept[NumberFormatException](
        GvtTxn.publish(coord, Map(s"$coord/t" -> 1)))
    }
    withConf("spark.graft.gvt.txnRetain" -> "0") {
      intercept[IllegalArgumentException](
        GvtTxn.publish(coord, Map(s"$coord/t" -> 1)))
    }
    // nothing linked under either failure
    assert(GvtTxn.latestVersion(coord) == 0)
  }

  // ---- cadence knobs ----------------------------------------------

  test("non-default txn checkpoint cadence keeps resolution+vacuum exact") {
    val coord = Staging.tempDir("r15_cadence_txn")
    withConf("spark.graft.gvt.txnCheckpointEvery" -> "3") {
      (0 until 11).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    }
    assert(Files.exists(Paths.get(coord, "_gvt_txn", "00000003.ckpt.json")))
    assert(Files.exists(Paths.get(coord, "_gvt_txn", "00000009.ckpt.json")))
    assert(!Files.exists(Paths.get(coord, "_gvt_txn", "00000010.ckpt.json")))
    (0 to 10).foreach { v =>
      assert(GvtTxn.pins(coord, v) == Map(s"$coord/t" -> v), s"pins($v)")
    }
    // cadence change mid-life is safe: resolution anchors newest-≤,
    // never assuming regularity
    (11 until 14).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    assert(GvtTxn.pins(coord, 13) == Map(s"$coord/t" -> 13))
    // vacuum to a non-checkpoint version writes its own anchor and
    // stays exact
    GvtTxn.vacuum(coord, 11)
    assert(GvtTxn.pins(coord, 11) == Map(s"$coord/t" -> 11))
    assert(GvtTxn.pins(coord, 13) == Map(s"$coord/t" -> 13))
    intercept[IllegalArgumentException](GvtTxn.pins(coord, 10))
  }

  test("non-default table checkpoint cadence keeps resolution exact") {
    val t = Staging.tempDir("r15_cadence_tbl")
    withConf("spark.graft.gvt.checkpointEvery" -> "4") {
      (0 until 9).foreach { i =>
        Gvt.append(spark, t,
          spark.range(i * 10L, (i + 1) * 10L).toDF("k"), Seq("k"))
      }
    }
    assert(Files.exists(Paths.get(t, "_gvt_log", "00000004.ckpt.json")))
    assert(Files.exists(Paths.get(t, "_gvt_log", "00000008.ckpt.json")))
    assert(!Files.exists(Paths.get(t, "_gvt_log", "00000010.ckpt.json")))
    assert(Gvt.read(spark, t).count() == 90)
    assert(Gvt.read(spark, t, Some(3)).count() == 40)
    withConf("spark.graft.gvt.checkpointEvery" -> "0") {
      intercept[IllegalArgumentException](
        Gvt.append(spark, t, spark.range(1).toDF("k"), Seq("k")))
    }
    // the malformed-cadence append failed before its commit linked
    assert(Gvt.latestVersion(t) == 8)
  }

  // ---- observable maintenance swallows ----------------------------

  test("txn checkpoint failure: commit survives, counter bumps, cadence resumes") {
    val coord = Staging.tempDir("r15_ckptfail_txn")
    (0 until 9).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    val before = GvtMaintenance.txnCkptSwallowed.get()
    GvtMaintenance.txnCkptFailpoint =
      () => throw new java.io.IOException("injected ckpt fault")
    try {
      // doc 10 is a cadence boundary: the checkpoint write fails, the
      // PUBLISH must not
      assert(GvtTxn.publish(coord, Map(s"$coord/t" -> 9)) == 9)
      assert(GvtTxn.publish(coord, Map(s"$coord/t" -> 10)) == 10)
    } finally GvtMaintenance.resetFailpoints()
    assert(GvtMaintenance.txnCkptSwallowed.get() == before + 1)
    assert(!Files.exists(Paths.get(coord, "_gvt_txn", "00000010.ckpt.json")))
    // resolution still exact (fold just anchors earlier)
    assert(GvtTxn.pins(coord, 10) == Map(s"$coord/t" -> 10))
    // fault cleared: the NEXT boundary checkpoints again
    (11 to 20).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    assert(Files.exists(Paths.get(coord, "_gvt_txn", "00000020.ckpt.json")))
    assert(GvtTxn.pins(coord, 20) == Map(s"$coord/t" -> 20))
  }

  test("table checkpoint failure: commit survives, counter bumps, cadence resumes") {
    val t = Staging.tempDir("r15_ckptfail_tbl")
    (0 until 10).foreach { i =>
      Gvt.append(spark, t, spark.range(i, i + 1).toDF("k"), Seq("k"))
    }
    val before = GvtMaintenance.tableCkptSwallowed.get()
    GvtMaintenance.tableCkptFailpoint =
      () => throw new java.io.IOException("injected ckpt fault")
    try {
      // version 10 is the boundary — the append must still commit
      assert(Gvt.append(spark, t, spark.range(10, 11).toDF("k"),
        Seq("k")) == 10)
    } finally GvtMaintenance.resetFailpoints()
    assert(GvtMaintenance.tableCkptSwallowed.get() == before + 1)
    assert(!Files.exists(Paths.get(t, "_gvt_log", "00000010.ckpt.json")))
    assert(Gvt.read(spark, t).count() == 11)
    // fault cleared: next boundary checkpoints, reads stay exact
    (11 until 21).foreach { i =>
      Gvt.append(spark, t, spark.range(i.toLong, i + 1L).toDF("k"), Seq("k"))
    }
    assert(Files.exists(Paths.get(t, "_gvt_log", "00000020.ckpt.json")))
    assert(Gvt.read(spark, t).count() == 21)
  }

  // ---- ADVICE r14 -------------------------------------------------

  test("absorb failure after a committed DV delete never fails the delete") {
    val t = Staging.tempDir("r15_absorbfail")
    Gvt.append(spark, t,
      spark.range(0, 100).select(col("id").as("k")), Seq("k"))
    val before = GvtMaintenance.absorbSwallowed.get()
    GvtMaintenance.absorbFailpoint =
      () => throw new RuntimeException("injected absorb fault")
    val v = try {
      // ~52% of every file deleted — crosses the 0.5 default in each —
      // so the absorb trigger fires and fails; pre-r15 this PROPAGATED
      // and the committed delete looked failed (ADVICE r14)
      Gvt.deleteWhereDV(spark, t, col("k") % 2 === 0)
    } finally GvtMaintenance.resetFailpoints()
    assert(v == 1, "the DV delete itself committed")
    assert(GvtMaintenance.absorbSwallowed.get() == before + 1)
    // vectors still present (the absorb never ran)...
    assert(Gvt.snapshot(t).exists(f => f.dv != null && f.dv.nonEmpty))
    assert(Gvt.read(spark, t).count() == 50)
    // ...and the policy re-fires on the next crossing once the fault
    // clears
    Gvt.deleteWhereDV(spark, t, col("k") % 4 === 1)
    assert(Gvt.snapshot(t).forall(f => f.dv == null || f.dv.isEmpty),
      "next crossing absorbed")
    assert(Gvt.read(spark, t).count() == 25)
  }

  test("tableRetain policy bounds table history with no manual vacuum") {
    val t = Staging.tempDir("r15_tblautovac")
    withConf("spark.graft.gvt.tableRetain" -> "3",
        "spark.graft.gvt.vacuumGraceMs" -> "0") {
      (0 until 14).foreach { i =>
        Gvt.append(spark, t,
          spark.range(i * 10L, (i + 1) * 10L).toDF("k").repartition(1),
          Seq("k"))
      }
    }
    // probes at v=3 (retainFrom 0, skipped), 6 (→3), 9 (→6), 12 (→9)
    assert(Gvt.vacuumFloor(t) == 9)
    assert(Gvt.latestVersion(t) == 13)
    // contract window resolves exactly; below-floor fails loudly
    assert(Gvt.read(spark, t).count() == 140)
    assert(Gvt.read(spark, t, Some(10)).count() == 110)
    assert(Gvt.read(spark, t, Some(9)).count() == 100)
    val e = intercept[IllegalArgumentException](Gvt.read(spark, t, Some(8)))
    assert(e.getMessage.contains("vacuumed"))
    // the table keeps working after the policy ran
    Gvt.append(spark, t, spark.range(1000, 1010).toDF("k"), Seq("k"))
    assert(Gvt.read(spark, t).count() == 150)
  }

  test("tableRetain is OFF by default; txn commits and restore never trigger") {
    val t = Staging.tempDir("r15_tblautovac_gate")
    (0 until 8).foreach { i =>
      Gvt.append(spark, t, spark.range(i, i + 1).toDF("k"), Seq("k"))
    }
    assert(Gvt.vacuumFloor(t) == 0, "policy must be off with no knob")
    withConf("spark.graft.gvt.tableRetain" -> "2",
        "spark.graft.gvt.vacuumGraceMs" -> "0") {
      // v=8 carries a txn token: the serialized regime owns the version
      // sequence, so the policy must not fire
      Gvt.appendTxn(spark, t, spark.range(100, 101).toDF("k"), Seq("k"),
        "txn-r15")
      assert(Gvt.vacuumFloor(t) == 0, "txn commit must not trigger")
      // v=9 is organic: under the SPAN trigger (r16 — previously the
      // v%R==0 modulo, which this commit would have skipped) the next
      // organic commit sees span 9 ≥ 2R=4 and catches the floor up to
      // v−R=7 regardless of which ops occupied the R-multiples
      Gvt.append(spark, t, spark.range(101, 102).toDF("k"), Seq("k"))
      assert(Gvt.vacuumFloor(t) == 7, "organic commit catches the floor up")
    }
    withConf("spark.graft.gvt.tableRetain" -> "1",
        "spark.graft.gvt.vacuumGraceMs" -> "0") {
      // restore at v=10 (span 3 ≥ 2R=2 would fire) — but restore, an
      // operator recovering history, is gated out of the policy
      Gvt.restore(spark, t, 8)
      assert(Gvt.vacuumFloor(t) == 7, "restore must not trigger")
    }
    // malformed knob fails BEFORE the commit links
    withConf("spark.graft.gvt.tableRetain" -> "-1") {
      intercept[IllegalArgumentException](
        Gvt.append(spark, t, spark.range(1).toDF("k"), Seq("k")))
    }
    assert(Gvt.latestVersion(t) == 10)
  }

  test("two concurrent table vacuums both complete; retained state exact") {
    // two operators' maintenance crons on one table: the physical walk
    // must tolerate the peer reaping the same entries (deleteIfExists,
    // vanished-file age checks), not abort half-done on NSFE. Threads
    // share the JVM but the races are filesystem-level — the cross-JVM
    // rmw smoke phase races the same pair across processes.
    val t = Staging.tempDir("r15_vacrace")
    (0 until 12).foreach { i =>
      Gvt.append(spark, t,
        spark.range(i * 10L, (i + 1) * 10L).toDF("k").repartition(1),
        Seq("k"))
    }
    val v = Gvt.compact(spark, t, smallRows = Long.MaxValue,
      targetFiles = 2, statsCols = Seq("k"))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until 2).foreach { _ =>
      pool.execute(() => {
        gate.await()
        try { Gvt.vacuum(t, v, graceMs = 0L); () }
        catch { case e: Throwable => errs.add(e) }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"racing vacuums threw: ${errs.peek()}")
    assert(Gvt.vacuumFloor(t) == v)
    assert(Gvt.read(spark, t).count() == 120)
    intercept[IllegalArgumentException](Gvt.read(spark, t, Some(v - 1)))
    // the log keeps working
    Gvt.append(spark, t, spark.range(1000, 1010).toDF("k"), Seq("k"))
    assert(Gvt.read(spark, t).count() == 130)
  }

  test("stale-wait doc walk survives a vacuum reaping the walked range") {
    val coord = Staging.tempDir("r15_walkvac")
    (0 until 13).foreach(i => GvtTxn.publish(coord, Map(s"$coord/t" -> i)))
    GvtTxn.vacuum(coord, 10)
    // the walk spans vacuumed docs (3..10 are gone): pre-r15 this threw
    // a raw NoSuchFileException and aborted the serialized commit;
    // now it resolves cumulatively at the walk's head
    assert(GvtTxn.pinRaisedIn(coord, s"$coord/t", 5, 2, 12))
    assert(!GvtTxn.pinRaisedIn(coord, s"$coord/t", 99, 2, 12))
    // un-vacuumed range still walks doc-by-doc
    assert(GvtTxn.pinRaisedIn(coord, s"$coord/t", 10, 10, 12))
    assert(!GvtTxn.pinRaisedIn(coord, s"$coord/t", 12, 10, 12))
  }
}
