package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Gvt

/** Dev probe: GVT streaming-source scale behavior, measured (protocol
  * of DevShuffleAudit/DevGvtScale — numbers land in BASELINE.md).
  *
  * Claims under test:
  *  1. TAIL COST ∝ CHURN: a caught-up consumer that receives one small
  *     commit pays for that commit's files, not the table — the
  *     incremental batch must be orders of magnitude cheaper than the
  *     initial snapshot (which must cost ≈ one full batch scan).
  *  2. CATCH-UP PACING: `maxVersionsPerBatch` trades batch count for
  *     batch size — replaying the same commit history in bounded
  *     batches costs ~the same total as one giant batch (the per-batch
  *     overhead is planning, not I/O), so bounding memory is ~free.
  *
  * Usage: runMain graft.DevStreamScale <replicaDir> [commits]
  */
object DevStreamScale {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val commits = if (args.length > 1) args(1).toInt else 20
    val spark = Sessions.localFor("32", dir, "ERROR")

    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stream-scale] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars").cache()
    val n = docs.count()
    println(s"[stream-scale] corpus: $n docs, $commits commits")

    val table = Staging.tempDir("gvt_streamscale")
    timed(s"build $commits append commits") {
      (0 until commits).foreach { i =>
        Gvt.append(spark, table,
          docs.filter(col("doc_id") % commits === i), Seq("doc_id"))
      }
    }

    def drain(extra: Map[String, String], label: String): Long = {
      var batches = 0L
      var rows = 0L
      val q = spark.readStream.format("graft.sources.GvtStreamSource")
        .options(extra).load(table)
        .writeStream
        .option("checkpointLocation", Staging.fastTempDir("streamscale_ckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          batches += 1; rows += b.count(); ()
        }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      timed(label) { q.processAllAvailable() }
      q.exception.foreach(throw _)
      q.stop()
      println(s"[stream-scale]   $label: $batches batches, $rows rows")
      rows
    }

    // baseline: one batch read of the same table
    timed("batch read (baseline full scan)") {
      Gvt.read(spark, table).count()
    }

    // claim 2: advance-by-one vs widest catch-up
    drain(Map.empty, s"catch-up maxVersionsPerBatch=1 ($commits batches)")
    drain(Map("maxVersionsPerBatch" -> commits.toString),
      "catch-up maxVersionsPerBatch=head (1 snapshot batch)")

    // claim 2b (round 10): the same trade for the CDC feed — a lagging
    // cdc consumer catching up on a deep commit backlog pays per-batch
    // planning per VERSION at default pacing, per RANGE when coarsened
    // (cdcBatch unions per-version diffs inside the range, so the feed
    // is identical either way — GvtStreamSpec proves row equality)
    drain(Map("mode" -> "cdc"),
      s"cdc catch-up maxVersionsPerBatch=1 ($commits batches)")
    drain(Map("mode" -> "cdc", "maxVersionsPerBatch" -> "16"),
      "cdc catch-up maxVersionsPerBatch=16 (snapshot + ranges)")

    // claim 1: caught-up consumer + one 0.1% commit
    val ckpt = Staging.fastTempDir("streamscale_tail_ckpt")
    def tailQuery(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graft.sources.GvtStreamSource")
        .option("maxVersionsPerBatch", commits.toString).load(table)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
        .trigger(Trigger.ProcessingTime(0))
        .start()
    val q1 = tailQuery()
    q1.processAllAvailable()
    q1.stop()
    val churn = docs.filter(col("doc_id") % 997 === 0) // ~0.1%
    val churnRows = churn.count()
    Gvt.append(spark, table, churn, Seq("doc_id"))
    timed(s"tail batch after a $churnRows-row commit (resumed checkpoint)") {
      val q2 = tailQuery()
      q2.processAllAvailable()
      q2.exception.foreach(throw _)
      q2.stop()
    }

    spark.stop()
  }
}
