package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single choke point for reading the fixture tables (SURVEY.md §7.1).
  *
  * All schema handling is schema-on-read from parquet footers; the corpus
  * is flat except `embeddings.embedding: ArrayType(FloatType)`
  * (FIXTURES.md). At 100 TB scale this is where partitioned layouts,
  * bucketing metadata, or a catalog would plug in — every operator goes
  * through here, so swapping `read.parquet(file)` for a partitioned table
  * scan is a one-line change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
