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
}
