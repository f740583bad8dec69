package graft.plans

import org.apache.spark.sql.SparkSession

/** The engine's recommended session configuration for large-cluster runs,
  * as code instead of a wiki page. Every setting states its reason; all
  * are plain public Spark confs.
  *
  * Sizing model (the arithmetic a 100 TB / 1000-executor run needs):
  *  - `shuffle.partitions`: target ~128-256 MiB of shuffle input per
  *    task. 100 TB scan with 10:1 projection/filter reduction → ~10 TB
  *    shuffled → ~40-80k partitions, NOT the 200 default; with AQE
  *    coalescing enabled, over-provisioning is safe (it merges small
  *    outputs), under-provisioning is not (spill + GC).
  *  - `files.maxPartitionBytes` 256 MiB: fewer, fuller scan tasks —
  *    scan task count is file-bytes / this.
  *  - AQE on, plus skew-join: runtime re-plan fixes what static stats
  *    miss at this scale (skewed keys, mis-estimated builds). The
  *    similarity joins additionally PIN their partitioning where AQE's
  *    byte-size heuristic would serialize compute-heavy stages (see
  *    ngramJaccard) — user repartition is exempt from coalescing.
  *  - broadcast threshold stays DEFAULT (10 MB): the dims this engine
  *    broadcasts are hinted explicitly with `broadcast()`; raising the
  *    global threshold risks driver OOM on 1000-executor fan-out.
  *  - runtime bloom filters + DPP are left ON (defaults) — their own
  *    thresholds (10 GB probe scan, non-broadcastable build) are already
  *    cluster-sized, which is why fixture tests force them instead.
  */
object Tuning {

  /** The conf set for a production-scale session as data (unit-tested);
    * `cores` is total executor cores; partitions target ~3 waves/stage.
    */
  def confs(cores: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (cores * 3).toString,
    "spark.sql.files.maxPartitionBytes" -> (256L << 20).toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")

  /** Apply [[confs]] to a builder for a production-scale session. */
  def forScale(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    confs(cores).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** The local harness variant the Verify/Bench mains mirror: same
    * shape, fixture-sized partition counts.
    */
  def forLocal(b: SparkSession.Builder, threads: Int): SparkSession.Builder =
    forScale(b, threads).config("spark.sql.shuffle.partitions",
      threads.toString)

  /** Data-derived INITIAL shuffle width (r7 verdict #2): one partition
    * per 8 MiB of compressed input under the fixture dir, floored at the
    * core count, capped at 4096. Fed to AQE's
    * `coalescePartitions.initialPartitionNum` by [[graft.Sessions]]:
    * with parallelism-first coalescing (the default) over-provisioning
    * costs only per-bucket overhead — AQE merges small shuffle outputs
    * back down — while UNDER-provisioning costs spill (measured: the ×100
    * replica at width pinned to 32 spilled 12 GB on q21x, ~2 M rows per
    * partition; the audit itself diagnosed the partition count). 8 MiB of
    * compressed scan input expands ~4-8× as in-flight rows, landing each
    * task comfortably inside its share of execution memory.
    *
    * At fixture SFs the floor wins (sf0.1 is ~18 MB → width = cores, the
    * exact config every oracle hash was validated under); the replicas
    * and any real deployment get width ∝ data automatically.
    */
  def widthFor(sfDir: String, cores: Int): Int = {
    def bytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(bytes).sum).getOrElse(0L)
    val total = bytes(new java.io.File(sfDir))
    math.max(cores, math.min(4096, (total / (8L << 20)).toInt))
  }
}
