package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single choke point for reading the fixture tables (SURVEY.md §7.1).
  *
  * All schema handling is schema-on-read from parquet footers; the corpus
  * is flat except `embeddings.embedding: ArrayType(FloatType)`
  * (FIXTURES.md). At 100 TB scale this is where partitioned layouts,
  * bucketing metadata, or a catalog would plug in — every operator goes
  * through here, so swapping `read.parquet(file)` for a partitioned table
  * scan is a one-line change.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4.x rejects by
  * default (PARQUET_TYPE_ILLEGAL). We read it via the documented
  * `spark.sql.legacy.parquet.nanosAsLong` escape hatch and truncate
  * ns→µs into a proper TimestampType — the same truncation DuckDB applies
  * when it surfaces TIMESTAMP_NS as TIMESTAMP, so oracle comparisons on
  * `unix_micros(ts)` are exact (verified against sf0.01).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** The table scan repartitioned to full shuffle width on `key` — for
    * explode-heavy consumers. A compressed file under Spark's scan-split
    * floor arrives as ONE partition (and a parquet row group can never
    * be split), so a downstream explode/hash chain would run in a single
    * task no matter the core count: the small-input/big-intermediate
    * trap (measured 37 s → 4.7 s on llm_dedup_substring at the 10×
    * replica). One narrow-input exchange buys full width for the
    * orders-of-magnitude-larger derived stream. At 100 TB file sizes
    * exceed the split floor and scans arrive wide — this exchange then
    * costs one pass over the narrow input, still cheap relative to the
    * derived work it parallelizes.
    */
  def wide(spark: SparkSession, sfDir: String, name: String,
      key: String = "doc_id"): DataFrame =
    apply(spark, sfDir, name).repartition(
      spark.conf.get("spark.sql.shuffle.partitions").toInt, col(key))
}
