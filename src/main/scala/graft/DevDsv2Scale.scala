package graft

import org.apache.spark.sql.functions._

import graft.sources.Gvt

/** Dev probe: the gvt DSv2 connector's DRIVER-SIDE constant at high
  * live-file counts. `GvtFileIndex` extends `InMemoryFileIndex`, which
  * stats every root path at construction — the manifest already knows
  * the paths (no directory listing), but not the byte sizes the stats
  * need. This measures that per-file cost so the production note in the
  * connector's scaladoc ("carry sizes in the manifest, synthesize the
  * FileStatuses") has a number attached instead of a hunch.
  *
  * Usage: runMain graft.DevDsv2Scale [nFiles]
  * Stages ONE commit holding `nFiles` parquet files (repartition before
  * write — file count is partition count), then times: (a) a cold
  * `spark.read.format("gvt").load()` + count, (b) a WHERE-pruned count,
  * (c) the same pruned read via the library path (readPrunedMulti) as
  * the no-file-stat control.
  */
object DevDsv2Scale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = Sessions.local("32", "ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("gvt-dsv2-scale-").toString + "/t"
    val rows = 100L * n
    // writeData range-clusters with AQE-coalesced width; pin the width
    // so the staged table really holds n files in one commit
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try Gvt.append(spark, dir,
      spark.range(rows).toDF("k").withColumn("v", col("k") * 10),
      Seq("k"))
    finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    val files = Gvt.snapshot(dir).size
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DSV2SCALE files=$files $what%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // r12 ordering: the PRUNED query goes FIRST, so "cold" measures the
    // metadata path (schema pin + manifest resolution + index build)
    // with no full-scan cost mixed in — the criterion is cold ≈ warm
    val pruned = time("connector_pruned_cold") {
      spark.read.format("gvt").option("path", dir).load()
        .filter(col("k") >= 100L && col("k") <= 250L).count()
    }
    assert(pruned == 151L)
    val warm = time("connector_pruned_warm") {
      spark.read.format("gvt").option("path", dir).load()
        .filter(col("k") >= 100L && col("k") <= 250L).count()
    }
    assert(warm == 151L)
    val cold = time("connector_full_count") {
      spark.read.format("gvt").option("path", dir).load().count()
    }
    assert(cold == rows)
    // CONTROL: the raw footer merge the r12 schema pin took off the
    // query path (pre-r12, every cold version resolution paid this)
    val schemaCost = time("footer_merge_control") {
      spark.read.option("mergeSchema", "true")
        .parquet(Gvt.snapshot(dir).map(f => s"$dir/${f.path}"): _*)
        .schema.size
    }
    println(s"DSV2SCALE schema cols=$schemaCost")
    val pinCost = time("pinned_schema_alone") {
      Gvt.pinnedSchema(dir).map(_.size).getOrElse(-1)
    }
    println(s"DSV2SCALE pin cols=$pinCost")
    val lib = time("library_pruned") {
      Gvt.readPruned(spark, dir, "k", 100.0, 250.0)._1.count()
    }
    assert(lib == 151L)
    // r12: the connector's MoR path at file-count scale — DV-delete 1%
    // of rows (touches EVERY file), then read through the connector
    // (per-file readers + broadcast position map) vs the library's
    // anti-join. Also asserts the two agree on the count.
    Gvt.deleteWhereDV(spark, dir, col("k") % 100L === 0L)
    val live = rows - rows / 100
    val dvConn = time("connector_dv_count") {
      spark.read.format("gvt").option("path", dir).load().count()
    }
    assert(dvConn == live, s"connector DV count $dvConn != $live")
    val dvConnWarm = time("connector_dv_warm") {
      spark.read.format("gvt").option("path", dir).load().count()
    }
    assert(dvConnWarm == live)
    val dvLib = time("library_dv_count") {
      Gvt.read(spark, dir).count()
    }
    assert(dvLib == live)
    val dvPruned = time("connector_dv_pruned") {
      spark.read.format("gvt").option("path", dir).load()
        .filter(col("k") >= 101L && col("k") <= 250L).count()
    }
    assert(dvPruned == 149L, s"dv pruned $dvPruned")
    spark.stop()
  }
}
