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
}
