package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Gvt, GvtTxn}

/** Crash-injection tests for the cross-table atomic publish: a
  * transaction that dies between its table commits leaves NEITHER
  * write visible through the txn view (the table-log orphan is
  * invisible until a doc pins it), the idempotent retry completes the
  * transaction without duplicating the append that landed before the
  * crash, and racing publishes max-merge so no pinned version ever
  * regresses.
  */
class GvtTxnSpec extends GraftSuite {
  import spark.implicits._

  private def slab(from: Long, until: Long): DataFrame =
    (from until until).map(k => (k, k * 10)).toDF("k", "v")

  private def summaryOf(n: Long): DataFrame =
    Seq((n, (0L until n).map(_ * 10).sum)).toDF("n_rows", "s")

  test("a crash between the two table writes leaves neither visible") {
    val base = Files.createTempDirectory("gvt-txn-").toString
    val fact = s"$base/fact"
    val summ = s"$base/summary"
    GvtTxn.commit(spark, base, Seq(
      (fact, slab(0, 100), Seq("k")),
      (summ, summaryOf(100), Seq("n_rows"))))
    assert(GvtTxn.read(spark, base, fact).count() == 100)
    // CRASH mid-transaction: the fact append landed in the fact's own
    // log; the summary write and the txn doc never happened
    Gvt.append(spark, fact, slab(100, 150), Seq("k"))
    assert(Gvt.latestVersion(fact) == 1, "setup: orphan commit missing")
    // through the view: still the complete txn-0 state on BOTH tables
    assert(GvtTxn.latestVersion(base) == 0, "half-transaction got a doc")
    assert(GvtTxn.read(spark, base, fact).count() == 100,
      "half-transaction visible through the txn view")
    assert(GvtTxn.read(spark, base, summ)
      .head.getAs[Long]("n_rows") == 100L)
  }

  test("idempotent retry completes the crashed txn without duplicating the landed append") {
    val base = Files.createTempDirectory("gvt-txn-").toString
    val fact = s"$base/fact"
    val summ = s"$base/summary"
    GvtTxn.commit(spark, base, Seq(
      (fact, slab(0, 100), Seq("k")),
      (summ, summaryOf(100), Seq("n_rows"))))
    // attempt 1: fact append lands (with the txn token), then crash
    assert(Gvt.appendTxn(spark, fact, slab(100, 150), Seq("k"),
      "txn-1").nonEmpty)
    // retry re-runs the WHOLE transaction under the same token
    GvtTxn.commitIdempotent(spark, base, "txn-1", Seq(
      (fact, slab(100, 150), Seq("k")),
      (summ, summaryOf(150), Seq("n_rows"))))
    assert(Gvt.latestVersion(fact) == 1, "retry duplicated the fact append")
    assert(GvtTxn.read(spark, base, fact).count() == 150)
    // the summary is an append-only log under appendTxn: v1 holds the
    // txn-0 row AND the txn-1 row, exactly once each
    val s1 = GvtTxn.read(spark, base, summ)
    assert(s1.count() == 2 &&
      s1.agg(max("n_rows")).head.getLong(0) == 150L)
    // a THIRD run is a complete no-op on both tables
    GvtTxn.commitIdempotent(spark, base, "txn-1", Seq(
      (fact, slab(100, 150), Seq("k")),
      (summ, summaryOf(150), Seq("n_rows"))))
    assert(Gvt.latestVersion(fact) == 1 && Gvt.latestVersion(summ) == 1)
    assert(GvtTxn.read(spark, base, fact).count() == 150)
    assert(GvtTxn.read(spark, base, summ).count() == 2,
      "third run duplicated a summary row")
  }

  test("publishes max-merge: disjoint txns both land, no pin regresses") {
    val base = Files.createTempDirectory("gvt-txn-").toString
    val t1 = s"$base/t1"
    val t2 = s"$base/t2"
    Gvt.append(spark, t1, slab(0, 10), Seq("k"))
    Gvt.append(spark, t1, slab(10, 20), Seq("k"))
    Gvt.append(spark, t2, slab(0, 5), Seq("k"))
    GvtTxn.publish(base, Map(t1 -> 1))
    GvtTxn.publish(base, Map(t2 -> 0))
    // carry-forward: the newest doc still pins t1
    assert(GvtTxn.tableVersion(base, t1).contains(1))
    assert(GvtTxn.tableVersion(base, t2).contains(0))
    // a stale republish of t1@0 (a slow racer) must not regress it
    GvtTxn.publish(base, Map(t1 -> 0))
    assert(GvtTxn.tableVersion(base, t1).contains(1),
      "stale publish regressed a pinned version")
    // time travel across txn versions stays consistent
    assert(GvtTxn.read(spark, base, t1, asOf = Some(0)).count() == 20)
    assert(GvtTxn.tableVersion(base, t2, asOf = Some(0)).isEmpty)
    // asOf above the head fails with the curated error, not a raw
    // NoSuchFileException from the doc read (r11 review finding)
    val e = intercept[IllegalArgumentException] {
      GvtTxn.tableVersion(base, t1, asOf = Some(99))
    }
    assert(e.getMessage.contains("no version 99"))
  }
}
