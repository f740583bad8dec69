package graft

import org.apache.spark.sql.functions._

import graft.sources.Gvt

/** Dev probe: CROSS-JVM GVT concurrency. Two independent JVMs (real
  * processes, launched by `tools/gvt_concurrent_smoke.sh`) append and
  * merge against the SAME table directory at the same time; a third
  * invocation checks that every commit serialized with no loss. The
  * in-JVM stress test (GvtSpec's 8-thread appender race) shares one
  * filesystem view through one process — this probe is the one that
  * would catch a `createLink` publish primitive that is only atomic
  * within a process (the r7 `join_bucketed` tmpdir race was found by
  * exactly this kind of cross-process check).
  *
  * Usage:
  *   runMain graft.DevGvtConcurrent write <table> <writerId> <nAppends>
  *   runMain graft.DevGvtConcurrent check <table> <nWriters> <nAppends>
  *
  * Each writer appends `nAppends` disjoint 1000-key slabs, then merges
  * an update over its own 5-key stripe (cross-JVM read-modify-write —
  * exercises [[Gvt.rmwRetry]] against a competing PROCESS, not thread).
  * Check asserts: exactly `nWriters*(nAppends+1)` commits serialized,
  * every appended row present exactly once, every merge visible.
  */
object DevGvtConcurrent {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val table = args(1)
    val spark = Sessions.local("4", "ERROR")
    // cross-process contention is heavier than in-process: give the
    // RMW retry loop more headroom than the default 3
    spark.conf.set("spark.graft.gvt.rmwRetries", "20")
    mode match {
      case "write" =>
        val writer = args(2).toInt
        val n = args(3).toInt
        (0 until n).foreach { i =>
          val lo = (writer.toLong * n + i) * 1000L
          Gvt.append(spark, table,
            spark.range(lo, lo + 1000L).toDF("k")
              .withColumn("v", col("k") * 10),
            Seq("k"))
        }
        val mlo = writer.toLong * 5
        Gvt.merge(spark, table,
          spark.range(mlo, mlo + 5).toDF("k")
            .withColumn("v", lit(-1L - writer)),
          "k", Seq("k"))
        println(s"[gvt-concurrent] writer $writer done")
      case "check" =>
        val nWriters = args(2).toInt
        val n = args(3).toInt
        val head = Gvt.latestVersion(table)
        val expectedCommits = nWriters * (n + 1)
        assert(head == expectedCommits - 1,
          s"expected $expectedCommits serialized commits, head is $head " +
            "(a lost publish means the createLink protocol raced)")
        val df = Gvt.read(spark, table).cache()
        val total = df.count()
        val expectRows = nWriters.toLong * n * 1000
        assert(total == expectRows, s"row loss: $total != $expectRows")
        val dups = df.groupBy("k").count().filter(col("count") > 1).count()
        assert(dups == 0, s"$dups duplicated keys — a merge replayed twice")
        (0 until nWriters).foreach { w =>
          val got = df.filter(col("k") >= w * 5L && col("k") < w * 5L + 5)
            .select("v").collect().map(_.getLong(0)).toSet
          assert(got == Set(-1L - w),
            s"writer $w's merge lost: stripe values $got")
        }
        println(s"[gvt-concurrent] CHECK OK: $expectedCommits commits, " +
          s"$total rows, all merges visible")
    }
    spark.stop()
  }
}
