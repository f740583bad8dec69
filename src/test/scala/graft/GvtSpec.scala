package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Gvt, GvtOps}

/** Format-level tests for the [[graft.sources.Gvt]] versioned table:
  * log replay, time travel, checkpoint-anchored resolution, optimistic
  * concurrency, copy-on-write file granularity (untouched files carry
  * over BY REFERENCE through delete/merge), manifest pruning, and
  * atomic compaction. The registry keys' end-state correctness is the
  * driver oracle's job; these tests cover the mechanisms the oracle
  * can't see (which files were rewritten, what a loser commit does).
  */
class GvtSpec extends GraftSuite {

  private def freshDir(): String = Staging.tempDir("gvt_spec")

  /** k in [lo, until), v = k * 10 — disjoint ranges make file-level
    * assertions deterministic. */
  private def slab(lo: Long, until: Long): DataFrame =
    spark.range(lo, until).toDF("k").withColumn("v", col("k") * 10)

  private def sortedRows(df: DataFrame): Seq[(Long, Long)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted

  test("append + log replay: latest snapshot is the union of commits") {
    val dir = freshDir()
    assert(Gvt.latestVersion(dir) == -1)
    assert(Gvt.append(spark, dir, slab(0, 10), Seq("k")) == 0)
    assert(Gvt.append(spark, dir, slab(10, 25), Seq("k")) == 1)
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 25L).map(k => (k, k * 10)))
  }

  test("time travel: asOf v reads the state as of commit v") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 5), Seq("k"))
    Gvt.append(spark, dir, slab(5, 9), Seq("k"))
    Gvt.delete(spark, dir, col("k") < 2, Seq("k"))
    assert(sortedRows(Gvt.read(spark, dir, asOf = Some(0))) ==
      (0L until 5L).map(k => (k, k * 10)))
    assert(sortedRows(Gvt.read(spark, dir, asOf = Some(1))) ==
      (0L until 9L).map(k => (k, k * 10)))
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (2L until 9L).map(k => (k, k * 10)))
    intercept[IllegalArgumentException](Gvt.read(spark, dir, Some(99)))
  }

  test("delete rewrites ONLY files containing matching rows") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10).repartition(1), Seq("k"))
    Gvt.append(spark, dir, slab(100, 110).repartition(1), Seq("k"))
    val before = Gvt.snapshot(dir).map(_.path)
    Gvt.delete(spark, dir, col("k") === 105L, Seq("k"))
    val after = Gvt.snapshot(dir).map(_.path)
    // the first slab's file must survive by reference (same path)
    assert(after.contains(before.head), s"untouched file was rewritten")
    assert(!after.contains(before(1)), s"touched file not replaced")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      ((0L until 10L) ++ (100L until 110L)).filter(_ != 105L)
        .map(k => (k, k * 10)))
    // predicate matching nothing is a no-op commit-wise
    val v = Gvt.latestVersion(dir)
    assert(Gvt.delete(spark, dir, col("k") === -1L, Seq("k")) == v)
  }

  test("merge: upsert semantics, untouched files carried by reference") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10).repartition(1), Seq("k"))
    Gvt.append(spark, dir, slab(100, 110).repartition(1), Seq("k"))
    val before = Gvt.snapshot(dir).map(_.path)
    // updates hit only the second slab; plus a pure insert
    val src = spark.range(105, 108).toDF("k")
      .withColumn("v", lit(-1L))
      .unionByName(spark.range(500, 502).toDF("k")
        .withColumn("v", col("k") * 10))
    Gvt.merge(spark, dir, src, "k", Seq("k"))
    val after = Gvt.snapshot(dir).map(_.path)
    assert(after.contains(before.head), "file outside source key range rewritten")
    assert(!after.contains(before(1)), "matched file not replaced")
    val expected =
      ((0L until 10L) ++ (100L until 110L)).map(k =>
        (k, if (k >= 105 && k < 108) -1L else k * 10)) ++
        (500L until 502L).map(k => (k, k * 10))
    assert(sortedRows(Gvt.read(spark, dir)) == expected.sorted)
  }

  test("checkpoint: resolution works with pre-checkpoint commits gone") {
    val dir = freshDir()
    (0 until 12).foreach(i => Gvt.append(spark, dir, slab(i, i + 1), Seq("k")))
    val ld = Paths.get(dir, Gvt.LogDir)
    assert(Files.exists(ld.resolve(f"${10}%08d.ckpt.json")),
      "no checkpoint written at version 10")
    // replay must anchor on the checkpoint, not version 0: deleting the
    // pre-checkpoint commit docs must not change the answer
    (0 until 10).foreach(v => Files.delete(ld.resolve(f"$v%08d.json")))
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 12L).map(k => (k, k * 10)))
  }

  test("optimistic concurrency: append retries past a taken version; " +
      "read-modify-write aborts") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 5), Seq("k"))
    // squat on the next version like a concurrent committer would
    val squat = Paths.get(dir, Gvt.LogDir).resolve(f"${1}%08d.json")
    Files.write(squat,
      """{"version":1,"op":"append","adds":[],"removes":[]}"""
        .getBytes("UTF-8"))
    assert(Gvt.append(spark, dir, slab(5, 8), Seq("k")) == 2,
      "append must land after the concurrent commit")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 8L).map(k => (k, k * 10)))
    // append RETRY loop: competing commit lands while append is writing
    // its data files (between its version read and its publish)
    GvtSpec.squatDir = dir
    GvtSpec.squatVersion = 3
    GvtSpec.squatted.set(false)
    val tap = udf { k: Long => GvtSpec.squatNow(); k }
    assert(Gvt.append(spark, dir,
        slab(8, 10).withColumn("k", tap(col("k"))), Seq("k")) == 4,
      "append must retry past the mid-flight commit and land at 4")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 10L).map(k => (k, k * 10)))
    // read-modify-write retry: the competing commit lands BETWEEN the
    // op's snapshot read and its publish (injected from inside
    // predicate evaluation — the probe job runs after the snapshot and
    // before the publish, and local mode keeps executors in this JVM).
    // The op must lose version 5 to the squat, RE-EXECUTE against the
    // new head, and land at 6 — BOTH writers commit, serialized.
    GvtSpec.squatDir = dir
    GvtSpec.squatVersion = Gvt.latestVersion(dir) + 1
    GvtSpec.squatted.set(false)
    val racing = udf { k: Long => GvtSpec.squatNow(); k == 0L }
    val vDel = Gvt.delete(spark, dir, racing(col("k")), Seq("k"))
    assert(vDel == GvtSpec.squatVersion + 1,
      s"delete must retry past the squat and land at ${GvtSpec.squatVersion + 1}, got $vDel")
    assert(Gvt.commitAt(dir, GvtSpec.squatVersion).op == "append",
      "the competing commit must survive the retried delete")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (1L until 10L).map(k => (k, k * 10)),
      "retried delete applied against the post-squat head")
    // DV delete is read-modify-write too (its manifest rewrite carries
    // the dv list of a snapshot that just went stale) — same retry
    GvtSpec.squatDir = dir
    GvtSpec.squatVersion = Gvt.latestVersion(dir) + 1
    GvtSpec.squatted.set(false)
    val racing2 = udf { k: Long => GvtSpec.squatNow(); k == 1L }
    val vDv = Gvt.deleteWhereDV(spark, dir, racing2(col("k")))
    assert(vDv == GvtSpec.squatVersion + 1, "DV delete must retry and land")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (2L until 10L).map(k => (k, k * 10)))
    // fail-fast opt-out: with rmwRetries=0 the abort surfaces as before
    spark.conf.set("spark.graft.gvt.rmwRetries", "0")
    try {
      GvtSpec.squatDir = dir
      GvtSpec.squatVersion = Gvt.latestVersion(dir) + 1
      GvtSpec.squatted.set(false)
      val racing3 = udf { k: Long => GvtSpec.squatNow(); k == 2L }
      intercept[java.util.ConcurrentModificationException](
        Gvt.delete(spark, dir, racing3(col("k")), Seq("k")))
    } finally spark.conf.unset("spark.graft.gvt.rmwRetries")
  }

  test("stress: 8 concurrent appenders, every commit serialized, no loss") {
    val dir = freshDir()
    // real thread-level contention on the publish protocol: 8 writers x
    // 4 appends each race for version numbers; hard-link publishing must
    // serialize all 32 commits with no overwrites and no lost rows
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    (0 until 8).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try (0 until 4).foreach { i =>
            val lo = (t * 4 + i) * 100L
            Gvt.append(spark, dir, slab(lo, lo + 100L), Seq("k"))
          } catch { case e: Throwable => failures.add(e) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"appenders threw: $failures")
    assert(Gvt.latestVersion(dir) == 31, "32 commits must serialize to v0..v31")
    assert(Gvt.read(spark, dir).count() == 3200L)
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 3200L).map(k => (k, k * 10)))
  }

  test("manifest pruning skips files and never affects the answer") {
    val dir = freshDir()
    (0 until 4).foreach(i =>
      Gvt.append(spark, dir,
        slab(i * 100L, i * 100L + 10L).repartition(1), Seq("k")))
    val (df, scanned, total) = Gvt.readPruned(spark, dir, "k", 100.0, 109.0)
    assert(total == 4 && scanned == 1,
      s"expected 1/4 files after pruning, got $scanned/$total")
    assert(sortedRows(df) == (100L until 110L).map(k => (k, k * 10)))
    // fully-pruned range: empty result, schema intact
    val (none, s2, _) = Gvt.readPruned(spark, dir, "k", 5000.0, 6000.0)
    assert(s2 == 0 && none.count() == 0)
    assert(none.columns.toSeq == Seq("k", "v"))
  }

  test("compaction: files shrink, content bit-identical, one atomic commit") {
    val dir = freshDir()
    (0 until 6).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10L, i * 10L + 10L).repartition(1),
        Seq("k")))
    val vBefore = Gvt.latestVersion(dir)
    Gvt.compact(spark, dir, smallRows = Long.MaxValue, targetFiles = 2,
      statsCols = Seq("k"))
    assert(Gvt.latestVersion(dir) == vBefore + 1, "compaction is one commit")
    assert(Gvt.snapshot(dir).size == 2)
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 60L).map(k => (k, k * 10)))
    // idempotent when there is nothing to gain
    assert(Gvt.compact(spark, dir, Long.MaxValue, 2, Seq("k")) == vBefore + 1)
  }

  test("diff: compaction yields an EMPTY feed; updates are delete+insert") {
    val dir = freshDir()
    (0 until 6).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10L, i * 10L + 10L).repartition(1),
        Seq("k")))
    val vPre = Gvt.latestVersion(dir)
    // layout maintenance moves every row to a new file — no semantic
    // change, so the bag-difference feed must cancel to nothing
    Gvt.compact(spark, dir, Long.MaxValue, 2, Seq("k"))
    assert(Gvt.diff(spark, dir, vPre, vPre + 1).count() == 0,
      "compaction must not surface in the change feed")
    // an upsert shows as one delete (old row) + one insert (new row)
    Gvt.merge(spark, dir,
      spark.range(5, 6).toDF("k").withColumn("v", lit(-1L)), "k", Seq("k"))
    val feed = Gvt.diff(spark, dir, vPre + 1, vPre + 2)
      .select("change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(feed == Set(("delete", 5L, 50L), ("insert", 5L, -1L)),
      s"unexpected feed: $feed")
    // cumulative diff from v0 state to head = net inserts only
    val cumulative = Gvt.diff(spark, dir, 0, vPre + 2)
    assert(cumulative.filter(col("change_type") === "delete").count() == 1,
      "only the updated row's old version is a net delete vs v0")
    assert(Gvt.diff(spark, dir, vPre, vPre).count() == 0, "self-diff empty")
  }

  test("registry keys: manifest pruning measurably skips fixture tiles") {
    val (scanned, total) = GvtOps.manifestPruneStats(spark, sf0001)
    assert(total == 8, s"tile staging should produce 8 files, got $total")
    assert(scanned <= 2, s"pruning should keep <=2 of 8 tiles, kept $scanned")
  }

  test("deleteKeys: distributed delete-by-join, untouched files intact") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10).repartition(1), Seq("k"))
    Gvt.append(spark, dir, slab(100, 110).repartition(1), Seq("k"))
    val before = Gvt.snapshot(dir).map(_.path)
    // delete-set computed by a Spark job (kills 104, 106, 108)
    val doomed = spark.range(52, 55).toDF("h")
      .select((col("h") * 2).as("k"))
    Gvt.deleteKeys(spark, dir, doomed, "k", Seq("k"))
    val after = Gvt.snapshot(dir).map(_.path)
    assert(after.contains(before.head), "file outside delete-set rewritten")
    assert(!after.contains(before(1)), "touched file not replaced")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      ((0L until 10L) ++ (100L until 110L))
        .filterNot(k => k == 104L || k == 106L || k == 108L)
        .map(k => (k, k * 10)))
    // empty delete-set and miss-everything delete-set are no-ops
    val v = Gvt.latestVersion(dir)
    assert(Gvt.deleteKeys(spark, dir,
      spark.range(0, 0).toDF("k"), "k", Seq("k")) == v)
    assert(Gvt.deleteKeys(spark, dir,
      spark.range(5000, 5003).toDF("k"), "k", Seq("k")) == v)
  }

  test("appendTxn: same txn commits once; distinct txns land normally") {
    val dir = freshDir()
    assert(Gvt.appendTxn(spark, dir, slab(0, 5), Seq("k"), "b-0") == Some(0))
    // redelivery of the same batch (even with different data) is refused
    assert(Gvt.appendTxn(spark, dir, slab(100, 110), Seq("k"), "b-0").isEmpty)
    assert(Gvt.appendTxn(spark, dir, slab(5, 9), Seq("k"), "b-1") == Some(1))
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 9L).map(k => (k, k * 10)))
    // plain (txn-less) commits never collide with txn checks
    Gvt.append(spark, dir, slab(9, 10), Seq("k"))
    assert(Gvt.appendTxn(spark, dir, slab(10, 11), Seq("k"), "b-2") == Some(3))
  }

  test("vacuum: dead files physically gone, floor enforced, state intact") {
    val dir = freshDir()
    (0 until 6).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10L, i * 10L + 10L).repartition(1),
        Seq("k")))
    Gvt.compact(spark, dir, Long.MaxValue, 2, Seq("k"))
    val head = Gvt.latestVersion(dir)
    val (dataDeleted, docsDeleted) = Gvt.vacuum(dir, head, graceMs = 0L)
    assert(dataDeleted >= 6, s"expected the 6 pre-compaction files gone, " +
      s"deleted $dataDeleted")
    assert(docsDeleted >= 6, s"expected pre-floor log docs gone, " +
      s"deleted $docsDeleted")
    // the latest state survives byte-for-byte
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 60L).map(k => (k, k * 10)))
    // disk now holds exactly the live snapshot's files
    val live = Gvt.snapshot(dir).size
    val onDisk = {
      val s = Files.walk(Paths.get(dir, "data"))
      try s.iterator().asScala
        .count(p => p.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    assert(onDisk == live, s"$onDisk parquet files on disk, $live live")
    // pre-floor time travel fails at snapshot resolution, not mid-read
    val e = intercept[IllegalArgumentException](Gvt.read(spark, dir, Some(2)))
    assert(e.getMessage.contains("vacuumed"))
    // idempotent at the same floor
    assert(Gvt.vacuum(dir, head, graceMs = 0L) == ((0, 0)))
  }

  test("vacuum grace window protects young unreferenced files") {
    val dir = freshDir()
    (0 until 3).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10L, i * 10L + 10L).repartition(1),
        Seq("k")))
    Gvt.compact(spark, dir, Long.MaxValue, 1, Seq("k"))
    val head = Gvt.latestVersion(dir)
    // default grace: files written milliseconds ago look like an
    // in-flight commit's and must survive the walk
    val (young, _) = Gvt.vacuum(dir, head)
    assert(young == 0, s"grace window should keep young files, deleted $young")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 30L).map(k => (k, k * 10)))
    // re-vacuuming AT the floor with zero grace reaps them — graced
    // skips are deferred, not leaked
    val (aged, _) = Gvt.vacuum(dir, head, graceMs = 0L)
    assert(aged >= 3, s"expected the pre-compaction files reaped, got $aged")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 30L).map(k => (k, k * 10)))
  }

  test("CoW delete keeps rows whose predicate evaluates to NULL") {
    val dir = freshDir()
    // x is null for k < 3 — SQL DELETE semantics remove only
    // predicate-TRUE rows; false AND null rows both stay
    val df = spark.range(0, 10).toDF("k")
      .withColumn("v", col("k") * 10)
      .withColumn("x", when(col("k") >= 3, col("k")))
    Gvt.append(spark, dir, df.repartition(1), Seq("k"))
    Gvt.delete(spark, dir, col("x") > 5, Seq("k"))
    val kept = Gvt.read(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == (0L to 5L), s"null-x rows must survive the delete: $kept")
    // the merge-on-read twin agrees
    val dir2 = freshDir()
    Gvt.append(spark, dir2, df.repartition(1), Seq("k"))
    Gvt.deleteWhereDV(spark, dir2, col("x") > 5)
    val kept2 = Gvt.read(spark, dir2).select("k")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(kept2 == (0L to 5L), s"DV delete disagrees with CoW: $kept2")
  }

  test("z-order GVT: 2-D box prune beats 1-D, correctness intact") {
    val (kept2d, kept1d, total) = GvtOps.gvtZorderStats(spark, sf0001)
    assert(total >= 4, s"expected several z-tiles, got $total")
    assert(kept2d <= 2, s"2-D box should map to ~1 Morton quadrant, kept $kept2d")
    assert(kept2d < kept1d || kept1d <= 2,
      s"2-D prune ($kept2d) should beat px-only prune ($kept1d)")
  }

  test("DV delete: no data file rewritten, reads apply vectors, " +
      "dvRows exact across stacked vectors") {
    val dir = freshDir()
    // this test's SUBJECT is the stacked-vector MoR state (70% deleted
    // on the low slab by the second vector), which the r14 auto-absorb
    // policy would rightly rewrite — opt out to keep the vectors
    spark.conf.set("spark.graft.gvt.dvAbsorbRatio", "2.0")
    try {
    Gvt.append(spark, dir, slab(0, 10).repartition(1), Seq("k"))
    Gvt.append(spark, dir, slab(100, 110).repartition(1), Seq("k"))
    val before = Gvt.snapshot(dir)
    Gvt.deleteWhereDV(spark, dir, col("k") % 2 === 0)
    val mid = Gvt.snapshot(dir)
    // the MoR contract: every data file path survives BY REFERENCE
    assert(mid.map(_.path).toSet == before.map(_.path).toSet,
      "DV delete rewrote a data file")
    assert(mid.forall(f => f.dvRows == 5 && Option(f.dv).exists(_.size == 1)),
      s"expected 1 vector x 5 rows per file, got $mid")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      ((0L until 10L) ++ (100L until 110L)).filter(_ % 2 == 1)
        .map(k => (k, k * 10)))
    // second vector stacks; already-deleted rows are NOT re-marked
    // (k%2==0 rows also satisfy k<4 but are dead already: only 1,3 match)
    Gvt.deleteWhereDV(spark, dir, col("k") < 4)
    val after = Gvt.snapshot(dir)
    assert(after.map(_.path).toSet == before.map(_.path).toSet)
    val first = after.find(_.dvRows == 7).getOrElse(
      fail(s"expected the low slab at dvRows 5+2, got $after"))
    assert(Option(first.dv).exists(_.size == 2), "second vector not stacked")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      ((0L until 10L) ++ (100L until 110L))
        .filter(k => k % 2 == 1 && k >= 4).map(k => (k, k * 10)))
    // time travel applies the vectors OF THAT VERSION only
    assert(sortedRows(Gvt.read(spark, dir, asOf = Some(1))) ==
      ((0L until 10L) ++ (100L until 110L)).map(k => (k, k * 10)))
    // matching nothing is a no-op commit-wise
    val v = Gvt.latestVersion(dir)
    assert(Gvt.deleteWhereDV(spark, dir, col("k") === -1L) == v)
    } finally spark.conf.unset("spark.graft.gvt.dvAbsorbRatio")
  }

  test("DV x CoW: rewrites absorb vectors and never resurrect rows") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10).repartition(1), Seq("k"))
    Gvt.deleteWhereDV(spark, dir, col("k") === 3L)
    // merge updates k=5; the rewrite must apply the vector (3 stays dead)
    val src = spark.range(5, 6).toDF("k").withColumn("v", lit(-1L))
    Gvt.merge(spark, dir, src, "k", Seq("k"))
    assert(Gvt.snapshot(dir).forall(f => Option(f.dv).forall(_.isEmpty)),
      "merge rewrite did not absorb the vector")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 10L).filter(_ != 3L).map(k => (k, if (k == 5) -1L else k * 10)))
    // probe precision: deleting the only live copy of a key, then
    // deleteKeys on that key, must be a manifest-level no-op
    Gvt.deleteWhereDV(spark, dir, col("k") === 7L)
    val v = Gvt.latestVersion(dir)
    val probeKeys = spark.range(7, 8).toDF("k")
    assert(Gvt.deleteKeys(spark, dir, probeKeys, "k", Seq("k")) == v,
      "DV-dead key dragged its file into a CoW rewrite")
    // compaction also absorbs
    Gvt.append(spark, dir, slab(100, 101).repartition(1), Seq("k"))
    Gvt.compact(spark, dir, Long.MaxValue, 1, Seq("k"))
    assert(Gvt.snapshot(dir).forall(f => Option(f.dv).forall(_.isEmpty)))
    assert(sortedRows(Gvt.read(spark, dir)) ==
      ((0L until 10L) ++ Seq(100L)).filter(k => k != 3L && k != 7L)
        .map(k => (k, if (k == 5) -1L else k * 10)))
  }

  test("absorbDeletes: manifest-driven rewrite drops vectors, " +
      "threshold spares lightly-deleted files") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 100).repartition(1), Seq("k"))
    Gvt.append(spark, dir, slab(100, 200).repartition(1), Seq("k"))
    // 50% dead in slab 1, 1% dead in slab 2 — built with the r14
    // auto-absorb policy off (50% is exactly the default trigger; the
    // MANUAL threshold mechanics are this test's subject)
    try {
      spark.conf.set("spark.graft.gvt.dvAbsorbRatio", "2.0")
      Gvt.deleteWhereDV(spark, dir, col("k") < 50 || col("k") === 199L)
    } finally spark.conf.unset("spark.graft.gvt.dvAbsorbRatio")
    val v = Gvt.latestVersion(dir)
    assert(Gvt.absorbDeletes(spark, dir, 0.9, Seq("k")) == v,
      "absorb at 0.9 should be a no-op (max deleted fraction is 0.5)")
    val v2 = Gvt.absorbDeletes(spark, dir, 0.25, Seq("k"))
    assert(v2 == v + 1)
    val snap = Gvt.snapshot(dir)
    // the heavy file was rewritten vector-free; the light one kept its DV
    assert(snap.exists(f => Option(f.dv).exists(_.nonEmpty) && f.dvRows == 1),
      s"lightly-deleted file should keep its vector: $snap")
    assert(snap.exists(f => Option(f.dv).forall(_.isEmpty)),
      s"heavily-deleted file should be vector-free: $snap")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (50L until 199L).map(k => (k, k * 10)))
  }

  test("DV x CDC: diff surfaces vector deletes; vacuum keeps live vectors") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    Gvt.deleteWhereDV(spark, dir, col("k") < 3)
    // CDC: the DV commit churns the file entry — 3 deletes, 0 inserts
    val feed = Gvt.diff(spark, dir, 0, 1)
      .select("change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(feed.toSeq ==
      Seq(("delete", 0L), ("delete", 1L), ("delete", 2L)), feed.toSeq)
    // vacuum at the DV version must keep BOTH the data files and the
    // vector sidecar — deleting a live vector would resurrect rows
    Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (3L until 10L).map(k => (k, k * 10)))
  }

  test("DV x pruning: manifest-pruned reads still apply the vectors") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10).repartition(1), Seq("k"))
    Gvt.append(spark, dir, slab(100, 110).repartition(1), Seq("k"))
    Gvt.deleteWhereDV(spark, dir, col("k") === 102L)
    val (df, kept, total) = Gvt.readPruned(spark, dir, "k", 100.0, 110.0)
    assert(kept == 1 && total == 2, s"prune kept $kept/$total")
    assert(df.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      (100L until 110L).filterNot(_ == 102L),
      "pruned read resurrected a vector-deleted row")
  }

  test("restore: metadata-only rollback, history preserved, CDC sees it") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    Gvt.append(spark, dir, slab(10, 20), Seq("k"))
    Gvt.delete(spark, dir, col("k") < 5, Seq("k")) // the "bad" commit
    def parquetCount(): Long = {
      val s = Files.walk(Paths.get(dir, "data"))
      try s.iterator().asScala
        .count(p => p.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val filesBefore = parquetCount()
    val v = Gvt.restore(spark, dir, toVersion = 1)
    assert(v == 3)
    // pure metadata: not one data file written
    assert(parquetCount() == filesBefore, "restore wrote data files")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 20L).map(k => (k, k * 10)))
    // the undone head stays time-travelable (audit trail)
    assert(sortedRows(Gvt.read(spark, dir, asOf = Some(2))) ==
      (5L until 20L).map(k => (k, k * 10)))
    // CDC across the restore = exactly the rows it brought back
    val feed = Gvt.diff(spark, dir, 2, 3)
      .select("change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(feed.toSeq == (0L until 5L).map(("insert", _)), feed.toSeq)
    // restoring to the current state is a no-op commit-wise
    assert(Gvt.restore(spark, dir, toVersion = 3) == 3)
    // history continues past a restore
    Gvt.append(spark, dir, slab(100, 101), Seq("k"))
    assert(Gvt.read(spark, dir).count() == 21)
  }

  test("incremental summary: feed-fold ≡ recompute, incl. a group dying") {
    val fact = freshDir(); val view = freshDir()
    def rows(status: String, keys: Range, price: Double): DataFrame = {
      import spark.implicits._
      keys.map(k => (k.toLong, status, price)).toDF(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    }
    Gvt.append(spark, fact, rows("A", 0 until 5, 10.0), Seq("o_orderkey"))
    Gvt.append(spark, fact, rows("B", 100 until 103, 7.5), Seq("o_orderkey"))
    // v2 wipes out group B ENTIRELY — the summary row must DISAPPEAR,
    // not linger at zero
    Gvt.delete(spark, fact, col("o_orderstatus") === "B", Seq("o_orderkey"))
    Gvt.append(spark, fact, rows("A", 5 until 7, 2.25), Seq("o_orderkey"))
    GvtOps.refreshSummary(spark, fact, view)
    val got = Gvt.read(spark, view)
      .select("o_orderstatus", "n_orders", "sum_cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq(("A", 7L, 5450L)), got)
    // the view is itself versioned: its state after fold 1 (before the
    // group-B wipe) is time-travelable and still shows B
    val v1 = Gvt.read(spark, view, asOf = Some(1))
      .select("o_orderstatus").collect().map(_.getString(0)).sorted.toSeq
    assert(v1.contains("B"), s"pre-wipe view state lost B: $v1")
  }

  test("timestamp time travel: strict ts order, exact resolution, edges") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))   // v0
    Gvt.append(spark, dir, slab(10, 20), Seq("k"))  // v1
    Gvt.append(spark, dir, slab(20, 30), Seq("k"))  // v2
    val ts = (0 to 2).map(v => Gvt.commitAt(dir, v).ts)
    // commits land well inside one millisecond of each other on this
    // box, so strictness here is the +1 bump actually firing
    assert(ts == ts.sorted && ts.distinct == ts, s"ts not strict: $ts")
    // exact hit resolves to exactly that version
    assert(Gvt.versionAt(dir, ts(1)) == 1)
    // between two commits: the earlier one
    assert(Gvt.versionAt(dir, ts(2) - 1) == 1)
    assert(Gvt.versionAt(dir, ts(0)) == 0)
    // after head: head
    assert(Gvt.versionAt(dir, ts(2) + 1000000) == 2)
    // before creation: -1, and the read raises a clear error
    assert(Gvt.versionAt(dir, ts(0) - 1) == -1)
    val ex = intercept[IllegalArgumentException] {
      Gvt.readAsOfTimestamp(spark, dir, ts(0) - 1)
    }
    assert(ex.getMessage.contains("created later"))
    // the read itself: state at ts(v1) is v0 union v1
    assert(sortedRows(Gvt.readAsOfTimestamp(spark, dir, ts(1))) ==
      (0L until 20L).map(k => (k, k * 10)))
  }

  test("registry keys return rows at sf0.001") {
    GvtOps.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf0001).count() > 0, s"$name returned no rows")
    }
  }

  test("DF manifest: snapshotDF ≡ snapshot, parquet twin written and " +
      "anchoring, pruning parity") {
    val dir = freshDir()
    (0 until 12).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10, i * 10 + 10).repartition(1),
        Seq("k")))
    Gvt.delete(spark, dir, col("k") === 55L, Seq("k"))
    // the parquet twin landed at the checkpoint cadence
    val pq = Paths.get(dir, Gvt.LogDir).resolve(f"${10}%08d.ckpt.parquet")
    assert(Files.isDirectory(pq), "no parquet checkpoint twin at v10")
    // DF manifest ≡ driver manifest, latest and time-traveled, including
    // rows/stats/dv fields (dv normalized: null ≡ empty)
    def asSet(files: Seq[Gvt.GvtFile]) =
      files.map(f => (f.path, f.rows, f.min, f.max,
        Option(f.dv).getOrElse(Nil), f.dvRows)).toSet
    def dfAsSet(df: DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getLong(1),
        r.getMap[String, String](2).toMap, r.getMap[String, String](3).toMap,
        Option(r.getSeq[String](4)).map(_.toSeq).getOrElse(Nil), r.getLong(5))
    }.toSet
    assert(dfAsSet(Gvt.snapshotDF(spark, dir)) == asSet(Gvt.snapshot(dir)))
    assert(dfAsSet(Gvt.snapshotDF(spark, dir, Some(7))) ==
      asSet(Gvt.snapshot(dir, Some(7))))
    // anchoring is real: drop the pre-checkpoint commit docs — the DF
    // path must resolve from the parquet twin + tail alone
    (0 until 10).foreach(v =>
      Files.delete(Paths.get(dir, Gvt.LogDir).resolve(f"$v%08d.json")))
    assert(dfAsSet(Gvt.snapshotDF(spark, dir)) == asSet(Gvt.snapshot(dir)))
    // pruning parity: same kept/total and the same rows as the driver path
    val ranges = Seq(("k", 30.0, 49.0))
    val (dDf, kept, total) = Gvt.readPrunedMultiDF(spark, dir, ranges)
    val (dDrv, keptDrv, totalDrv) = Gvt.readPrunedMulti(spark, dir, ranges)
    assert((kept, total) == (keptDrv.toLong, totalDrv.toLong),
      s"prune counts diverge: df ($kept,$total) vs driver ($keptDrv,$totalDrv)")
    assert(kept < total, "nothing pruned in a range-tiled table")
    assert(sortedRows(dDf) == sortedRows(dDrv))
  }

  test("parquetOnlyCheckpoints: no JSON ckpt, both read paths correct") {
    val dir = freshDir()
    spark.conf.set("spark.graft.gvt.parquetOnlyCheckpoints", "true")
    try {
      (0 until 12).foreach(i =>
        Gvt.append(spark, dir, slab(i, i + 1), Seq("k")))
      val ld = Paths.get(dir, Gvt.LogDir)
      assert(!Files.exists(ld.resolve(f"${10}%08d.ckpt.json")),
        "JSON checkpoint written in parquet-only mode")
      assert(Files.isDirectory(ld.resolve(f"${10}%08d.ckpt.parquet")),
        "parquet checkpoint missing in parquet-only mode")
      // driver path replays the longer tail; DF path anchors on parquet
      assert(sortedRows(Gvt.read(spark, dir)) ==
        (0L until 12L).map(k => (k, k * 10)))
      assert(Gvt.snapshotDF(spark, dir).count() ==
        Gvt.snapshot(dir).size.toLong)
    } finally spark.conf.unset("spark.graft.gvt.parquetOnlyCheckpoints")
  }

  test("auto parquet-only: JSON ckpt stops once the previous one is big, stays off") {
    val dir = freshDir()
    val ld = Paths.get(dir, Gvt.LogDir)
    // tiny byte threshold stands in for the 16 MiB (~8e4 entries)
    // default — the flip logic is identical, only the scale differs
    spark.conf.set("spark.graft.gvt.jsonCheckpointMaxBytes", "200")
    try {
      (0 until 22).foreach(i => Gvt.append(spark, dir, slab(i, i + 1), Seq("k")))
      // v10: previous ckpt (v0) absent -> JSON still written
      assert(Files.exists(ld.resolve(f"${10}%08d.ckpt.json")),
        "fresh table must keep writing JSON checkpoints")
      // v20: v10's JSON outgrew the threshold -> parquet twin only
      assert(!Files.exists(ld.resolve(f"${20}%08d.ckpt.json")),
        "JSON checkpoint written past the size threshold")
      assert(Files.isDirectory(ld.resolve(f"${20}%08d.ckpt.parquet")))
      // sticky: v30 sees no JSON at v20 but a twin -> stays parquet-only
      (22 until 32).foreach(i => Gvt.append(spark, dir, slab(i, i + 1), Seq("k")))
      assert(!Files.exists(ld.resolve(f"${30}%08d.ckpt.json")),
        "auto parquet-only must be sticky once flipped")
      assert(Files.isDirectory(ld.resolve(f"${30}%08d.ckpt.parquet")))
      // both read paths stay correct across the flip
      assert(sortedRows(Gvt.read(spark, dir)) ==
        (0L until 32L).map(k => (k, k * 10)))
      assert(Gvt.snapshotDF(spark, dir).count() ==
        Gvt.snapshot(dir).size.toLong)
    } finally spark.conf.unset("spark.graft.gvt.jsonCheckpointMaxBytes")
  }

  test("vacuum reaps pre-floor parquet checkpoint twins") {
    val dir = freshDir()
    (0 until 22).foreach(i => Gvt.append(spark, dir, slab(i, i + 1), Seq("k")))
    val ld = Paths.get(dir, Gvt.LogDir)
    assert(Files.isDirectory(ld.resolve(f"${10}%08d.ckpt.parquet")))
    Gvt.vacuum(dir, retainFrom = 15, graceMs = 0L)
    assert(!Files.exists(ld.resolve(f"${10}%08d.ckpt.parquet")),
      "pre-floor parquet twin survived vacuum")
    assert(Files.isDirectory(ld.resolve(f"${20}%08d.ckpt.parquet")),
      "retained parquet twin deleted")
    // and the DF path still resolves above the floor
    assert(Gvt.snapshotDF(spark, dir).count() == 22L)
  }

  test("vacuum reaps aged leaked .tmp-pqckpt-* twins, keeps young ones") {
    val dir = freshDir()
    (0 until 3).foreach(i => Gvt.append(spark, dir, slab(i, i + 1), Seq("k")))
    val ld = Paths.get(dir, Gvt.LogDir)
    // simulate a writer that crashed between twin write and atomic move
    val leakedAged = ld.resolve(".tmp-pqckpt-deadbeef")
    val leakedYoung = ld.resolve(".tmp-pqckpt-young123")
    Files.createDirectory(leakedAged)
    Files.write(leakedAged.resolve("part-0.parquet"), Array[Byte](1, 2))
    Files.createDirectory(leakedYoung)
    Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 60000L)
    assert(Files.exists(leakedAged) && Files.exists(leakedYoung),
      "grace window must protect a possibly-live twin write")
    Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    assert(!Files.exists(leakedAged), "aged leaked twin survived vacuum")
    assert(!Files.exists(leakedYoung), "aged leaked twin survived vacuum")
  }

  test("diffWithUpdates pairs churned keys into update images; no-op rewrites stay silent") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    import spark.implicits._
    // update k∈{2,4}, NO-OP "update" k=6 (byte-identical row — must
    // cancel in diff and never reach the pairing), insert k=100
    val src = Seq((2L, 21L), (4L, 41L), (6L, 60L), (100L, 1000L)).toDF("k", "v")
    Gvt.merge(spark, dir, src, "k", Seq("k"))
    val d = Gvt.diffWithUpdates(spark, dir, 0, 1, Seq("k"))
      .collect().map(r => (r.getAs[String]("change_type"),
        r.getAs[Long]("k"), r.getAs[Long]("v"))).toSet
    assert(d == Set(
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 21L),
      ("update_preimage", 4L, 40L), ("update_postimage", 4L, 41L),
      ("insert", 100L, 1000L)), s"got $d")
    // a pure delete commit stays a delete — no phantom pairing
    Gvt.delete(spark, dir, col("k") === 3L, Seq("k"))
    val d2 = Gvt.diffWithUpdates(spark, dir, 1, 2, Seq("k"))
      .collect().map(r => (r.getAs[String]("change_type"),
        r.getAs[Long]("k"), r.getAs[Long]("v"))).toSet
    assert(d2 == Set(("delete", 3L, 30L)), s"got $d2")
  }

  test("branch: isolated writes, publish squashes atomically, audit ≡ published") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    val b = Gvt.createBranch(spark, dir, "wap")
    assert(Gvt.listBranches(dir) == Seq("wap"))
    // branch sees the fork state; every op works on the branch dir
    assert(sortedRows(Gvt.read(spark, b)) == (0L until 10L).map(k => (k, k * 10)))
    Gvt.append(spark, b, slab(10, 20), Seq("k"))
    Gvt.delete(spark, b, col("k") % 5 === 4L, Seq("k"))   // CoW audit fix
    val audited = sortedRows(Gvt.read(spark, b))
    // parent saw NOTHING of it
    assert(sortedRows(Gvt.read(spark, dir)) == (0L until 10L).map(k => (k, k * 10)))
    val v = Gvt.publishBranch(spark, dir, "wap")
    assert(v == 1 && Gvt.latestVersion(dir) == 1, "squash = ONE parent commit")
    assert(sortedRows(Gvt.read(spark, dir)) == audited,
      "published state must equal the audited branch read")
    // time travel on the parent still has the pre-publish state
    assert(sortedRows(Gvt.read(spark, dir, asOf = Some(0))) ==
      (0L until 10L).map(k => (k, k * 10)))
    Gvt.dropBranch(dir, "wap")
    assert(Gvt.listBranches(dir).isEmpty)
    // the shared data pool survived the drop (the data symlink is
    // unlinked as an entry, never followed)
    assert(sortedRows(Gvt.read(spark, dir)) == audited)
  }

  test("branch: append-only branch lands on an advanced head; rewrite branch aborts") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    val bApp = Gvt.createBranch(spark, dir, "drops")
    Gvt.append(spark, bApp, slab(100, 110), Seq("k"))
    val bRw = Gvt.createBranch(spark, dir, "fixes")
    Gvt.delete(spark, bRw, col("k") < 2L, Seq("k"))
    // parent advances past both forks
    Gvt.append(spark, dir, slab(10, 15), Seq("k"))
    // append-only branch: removes are empty by construction — safe
    Gvt.publishBranch(spark, dir, "drops")
    val got = sortedRows(Gvt.read(spark, dir))
    assert(got == ((0L until 15L) ++ (100L until 110L)).map(k => (k, k * 10)),
      "rebased publish must carry both the parent's and the branch's rows")
    // rewrite branch: its audit no longer describes the outcome — abort
    spark.conf.set("spark.graft.gvt.rmwRetries", "0")
    try intercept[java.util.ConcurrentModificationException] {
      Gvt.publishBranch(spark, dir, "fixes")
    } finally spark.conf.unset("spark.graft.gvt.rmwRetries")
    // double-create is a loud failure
    intercept[IllegalStateException] { Gvt.createBranch(spark, dir, "drops") }
  }

  test("branch: linked-anchor seed resolves through a checkpointed parent; DF publish ≡ driver publish") {
    val dir = freshDir()
    // 12 commits: the parent crosses CheckpointEvery, so the fork seed
    // must anchor on the parent's own checkpoint + linked tail (no
    // fresh fork-manifest checkpoint is written any more)
    (0 until 12).foreach(i => Gvt.append(spark, dir, slab(i * 10, i * 10 + 10), Seq("k")))
    val b = Gvt.createBranch(spark, dir, "linked")
    val bld = Paths.get(b, Gvt.LogDir)
    assert(Files.exists(bld.resolve(f"${10}%08d.ckpt.json")),
      "seed must hard-link the parent's newest checkpoint, not write one at the fork")
    assert(!Files.exists(bld.resolve(f"${11}%08d.ckpt.json")),
      "no fork-version checkpoint should be fabricated")
    assert(sortedRows(Gvt.read(spark, b)) == (0L until 120L).map(k => (k, k * 10)))
    // branch time travel BELOW the fork works through the linked tail
    assert(sortedRows(Gvt.read(spark, b, asOf = Some(10))) ==
      (0L until 110L).map(k => (k, k * 10)))
    // both publish regimes produce the same commit: audit on the
    // branch (append + DV delete — a surviving path whose dv changed,
    // the identity case the (path, dv, dvRows) key exists for)
    Gvt.append(spark, b, slab(200, 210), Seq("k"))
    Gvt.deleteWhereDV(spark, b, col("k") === 5L)
    spark.conf.set("spark.graft.gvt.publishViaDF", "true")
    val v = try Gvt.publishBranch(spark, dir, "linked")
      finally spark.conf.unset("spark.graft.gvt.publishViaDF")
    val dfCommit = Gvt.commitAt(dir, v)
    val expected = ((0L until 120L) ++ (200L until 210L)).filter(_ != 5L)
    assert(sortedRows(Gvt.read(spark, dir)) == expected.map(k => (k, k * 10)))
    // driver-path control on an identical second branch of the same fork
    val dir2 = freshDir()
    (0 until 12).foreach(i => Gvt.append(spark, dir2, slab(i * 10, i * 10 + 10), Seq("k")))
    val b2 = Gvt.createBranch(spark, dir2, "linked")
    Gvt.append(spark, b2, slab(200, 210), Seq("k"))
    Gvt.deleteWhereDV(spark, b2, col("k") === 5L)
    spark.conf.set("spark.graft.gvt.publishViaDF", "false")
    val v2 = try Gvt.publishBranch(spark, dir2, "linked")
      finally spark.conf.unset("spark.graft.gvt.publishViaDF")
    val drvCommit = Gvt.commitAt(dir2, v2)
    assert(dfCommit.adds.map(_.path).sorted.size == drvCommit.adds.map(_.path).sorted.size &&
      dfCommit.removes.sorted == drvCommit.removes.sorted,
      s"DF and driver publish disagree: ${dfCommit.adds.size}/${dfCommit.removes} vs " +
        s"${drvCommit.adds.size}/${drvCommit.removes}")
    assert(sortedRows(Gvt.read(spark, dir2)) == expected.map(k => (k, k * 10)))
  }

  test("snapshotDF upserts re-added paths: a DV-audit publish yields no duplicate manifest rows") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    val b = Gvt.createBranch(spark, dir, "dvdup")
    Gvt.deleteWhereDV(spark, b, col("k") === 3L) // path survives, dv swaps
    // publish commits adds=[path with dv] and removes=[] — the upsert
    // shape the DF fold must handle like the driver's LinkedHashMap.put
    Gvt.publishBranch(spark, dir, "dvdup")
    Gvt.dropBranch(dir, "dvdup")
    val m = Gvt.snapshotDF(spark, dir)
    assert(m.count() == Gvt.snapshot(dir).size.toLong,
      "DF manifest diverged from the driver manifest")
    assert(m.groupBy("path").count().filter(col("count") > 1).count() == 0,
      "duplicate manifest row after DV re-add")
    // the DF-path read must not resurrect the DV-deleted row through a
    // dv-less duplicate entry
    val (df, _, _) = Gvt.readPrunedMultiDF(spark, dir, Seq(("k", 0.0, 1e9)))
    assert(df.count() == 9L, "DF-path read resurrected a DV-deleted row")
  }

  test("re-publishing a stale branch: rewrite branches abort, append-only ones stay state-neutral") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    // a REWRITE branch cannot re-publish at all: its own first publish
    // advanced the parent past the fork, so the advanced-head guard
    // fires before any duplicate commit can form
    val b = Gvt.createBranch(spark, dir, "stale")
    Gvt.append(spark, b, slab(100, 110), Seq("k"))
    Gvt.deleteWhereDV(spark, b, col("k") === 105L)
    Gvt.publishBranch(spark, dir, "stale")
    spark.conf.set("spark.graft.gvt.rmwRetries", "0")
    try intercept[java.util.ConcurrentModificationException] {
      Gvt.publishBranch(spark, dir, "stale")
    } finally spark.conf.unset("spark.graft.gvt.rmwRetries")
    Gvt.dropBranch(dir, "stale")
    // an APPEND-ONLY stale branch re-publishes (rebase is legal), but
    // its adds re-add live (path, dv) entries with no removes — the
    // log's upsert contract must keep BOTH manifest paths duplicate-
    // free and the state unchanged (one junk commit aside)
    val b2 = Gvt.createBranch(spark, dir, "stale2")
    Gvt.append(spark, b2, slab(200, 210), Seq("k"))
    Gvt.publishBranch(spark, dir, "stale2")
    val rows = sortedRows(Gvt.read(spark, dir))
    def manifestKey() = Gvt.snapshot(dir)
      .map(f => f.path + "#" + Option(f.dv).getOrElse(Nil).mkString(",")).sorted
    val manifest = manifestKey()
    Gvt.publishBranch(spark, dir, "stale2")
    assert(sortedRows(Gvt.read(spark, dir)) == rows, "re-publish changed state")
    assert(manifestKey() == manifest)
    val m = Gvt.snapshotDF(spark, dir)
    assert(m.count() == manifest.size.toLong &&
      m.groupBy("path").count().filter(col("count") > 1).count() == 0,
      "re-publish duplicated manifest rows on the DF path")
    Gvt.dropBranch(dir, "stale2")
  }

  test("vacuum pins a branch's SUB-FORK reads; vacuum on a branch dir refuses") {
    val dir = freshDir()
    (0 until 11).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10, i * 10 + 10), Seq("k"))) // ckpt at v10
    Gvt.delete(spark, dir, col("k") < 10L, Seq("k")) // v11 drops v0's file
    val b = Gvt.createBranch(spark, dir, "history") // fork 11, links [10, 11]
    intercept[IllegalArgumentException] { Gvt.vacuum(b, 0, graceMs = 0L) }
    // parent vacuums to head: v0's file is referenced ONLY by the
    // branch's sub-fork read at the linked checkpoint version
    Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    assert(sortedRows(Gvt.read(spark, b, asOf = Some(10))) ==
      (0L until 110L).map(k => (k, k * 10)),
      "parent vacuum reaped a file the branch's sub-fork read needs")
  }

  test("vacuum survives a seedless branch residue (claim without log seed)") {
    val dir = freshDir()
    (0 until 3).foreach(i =>
      Gvt.append(spark, dir, slab(i * 10, i * 10 + 10), Seq("k")))
    Gvt.delete(spark, dir, col("k") < 10L, Seq("k")) // v3 orphans v0's file
    // simulate a crash between createBranch's branch.json claim and its
    // log seed: a listed branch with NO linked commit docs. Pre-r11 the
    // parent vacuum threw require(last >= 0) on it — forever, until the
    // residue was hand-removed.
    val bdir = Paths.get(Gvt.branchDir(dir, "crashed"))
    Files.createDirectories(bdir)
    Files.write(bdir.resolve("branch.json"), """{"base":2}""".getBytes("UTF-8"))
    val head = Gvt.latestVersion(dir)
    val (d1, _) = Gvt.vacuum(dir, head, graceMs = 0L)
    // the residue might be a LIVE createBranch mid-seed about to link
    // sub-floor history, so it pins the parent's full resolvable range:
    // no DATA file referenced by ANY version may be deleted (pre-floor
    // log docs still age out — the pin is about the shared data pool)
    assert(d1 == 0, s"vacuum deleted $d1 files while a seedless branch was listed")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (10L until 30L).map(k => (k, k * 10)), "head read broken after residue vacuum")
    // dropping the residue releases the pin; the orphaned file reaps
    Gvt.dropBranch(dir, "crashed")
    val (d2, _) = Gvt.vacuum(dir, head, graceMs = 0L)
    assert(d2 > 0, "vacuum reaped nothing after the residue was dropped")
  }

  test("append-only branch publishes after the parent's floor passes the fork") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k")) // v0
    val b = Gvt.createBranch(spark, dir, "late") // fork at 0
    Gvt.append(spark, b, slab(100, 110), Seq("k"))
    Gvt.append(spark, dir, slab(10, 20), Seq("k")) // v1
    Gvt.vacuum(dir, 1, graceMs = 0L) // parent floor 1 > fork 0
    // fork-state resolution must come from the BRANCH's linked log —
    // the parent can no longer serve version 0
    Gvt.publishBranch(spark, dir, "late")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      ((0L until 20L) ++ (100L until 110L)).map(k => (k, k * 10)))
  }

  test("auto parquet-only survives a vacuum that deletes the cadence-aligned checkpoint") {
    val dir = freshDir()
    spark.conf.set("spark.graft.gvt.jsonCheckpointMaxBytes", "1")
    try {
      (0 until 25).foreach(i =>
        Gvt.append(spark, dir, slab(i * 10, i * 10 + 10), Seq("k")))
      // v20 already flipped parquet-only (v10's JSON outgrew 1 byte)
      assert(!Files.exists(Paths.get(dir, Gvt.LogDir, f"${20}%08d.ckpt.json")))
      Gvt.vacuum(dir, 22, graceMs = 0L) // deletes docs < 22, JSON ckpt at 22
      (25 until 31).foreach(i =>
        Gvt.append(spark, dir, slab(i * 10, i * 10 + 10), Seq("k")))
      // v30's probe must find the floor checkpoint (newest-≤ scan), not
      // look at exactly v20 and fall back onto the driver JSON path
      assert(!Files.exists(Paths.get(dir, Gvt.LogDir, f"${30}%08d.ckpt.json")),
        "big table flipped back to the driver JSON checkpoint after vacuum")
      assert(Files.isDirectory(Paths.get(dir, Gvt.LogDir, f"${30}%08d.ckpt.parquet")))
    } finally spark.conf.unset("spark.graft.gvt.jsonCheckpointMaxBytes")
  }

  test("branch: DV audit publishes vectors; vacuum pins live branches, reaps dropped ones") {
    val dir = freshDir()
    Gvt.append(spark, dir, slab(0, 10), Seq("k"))
    val b = Gvt.createBranch(spark, dir, "dv")
    Gvt.append(spark, b, slab(10, 20), Seq("k"))
    Gvt.deleteWhereDV(spark, b, col("k") === 13L)   // MoR audit fix
    // an aged parent vacuum BEFORE publish must not reap the branch's
    // unique files (shared pool, branch still live)
    Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    assert(sortedRows(Gvt.read(spark, b)) ==
      ((0L until 10L) ++ (10L until 20L).filter(_ != 13L)).map(k => (k, k * 10)))
    Gvt.publishBranch(spark, dir, "dv")
    // the squash carried the DV sidecar: 13 stays dead on the parent
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 20L).filter(_ != 13L).map(k => (k, k * 10)))
    // drop an ABANDONED branch: its unique files become unreferenced
    val junk = Gvt.createBranch(spark, dir, "junk")
    Gvt.append(spark, junk, slab(1000, 2000), Seq("k"))
    val before = Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    assert(before._1 == 0, s"live-branch files reaped: $before")
    Gvt.dropBranch(dir, "junk")
    val after = Gvt.vacuum(dir, Gvt.latestVersion(dir), graceMs = 0L)
    assert(after._1 > 0, "dropped branch's unique files must age out")
    assert(sortedRows(Gvt.read(spark, dir)) ==
      (0L until 20L).filter(_ != 13L).map(k => (k, k * 10)))
  }
}

object GvtSpec {
  @volatile var squatDir: String = _
  @volatile var squatVersion: Int = _
  val squatted = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Called from executor threads (same JVM in local mode): publishes a
    * competing commit exactly once, mid-operation. */
  def squatNow(): Unit =
    if (squatted.compareAndSet(false, true)) {
      Files.write(
        Paths.get(squatDir, Gvt.LogDir).resolve(f"$squatVersion%08d.json"),
        """{"version":0,"op":"append","adds":[],"removes":[]}"""
          .getBytes("UTF-8"))
    }
}
