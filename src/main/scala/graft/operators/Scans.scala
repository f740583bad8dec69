package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.Tables

/** SURVEY.md §2.1 — scans, sources, sinks.
  *
  * Scale notes: `scan_pruned` exists to prove column pruning reaches the
  * parquet reader (ReadSchema shows 2 columns); `filter` queries elsewhere
  * prove predicate pushdown (PushedFilters non-empty). `sink_parquet`
  * writes a `partitionBy` layout — the 100 TB-correct sink shape (daily
  * partitions → partition pruning on read).
  */
object Scans {

  def scanParquet(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .orderBy("l_orderkey", "l_linenumber")

  def scanPruned(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .orderBy("l_orderkey", "l_quantity")

  /** CSV write + schema-on-read round trip (the reference's CSV-parse step
    * re-expressed; no oracle — filesystem side effect).
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val tmp = graft.Staging.memoDir("graft_csv", dir) { tmp =>
      nation.write.mode("overwrite").option("header", "true").csv(tmp)
    }
    spark.read.schema(nation.schema).option("header", "true").csv(tmp)
      .orderBy("n_nationkey")
  }

  /** ORC write + read-back (second columnar format). */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_orc", dir) { tmp =>
      Tables(spark, dir, "supplier").write.mode("overwrite").orc(tmp)
    }
    spark.read.orc(tmp).orderBy("s_suppkey")
  }

  /** Avro write + read-back (the row-oriented interchange format; Spark
    * 4 bundles the Avro source in spark-sql). Schema travels in the file
    * footer, so read-back needs no declared schema; int32/string/double
    * columns map 1:1. Avro's role at scale is streaming/interchange —
    * columnar scans stay parquet/ORC.
    */
  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // this build's spark-sql jar carries the Avro classes but not the
    // `avro` DataSourceRegister service entry — address the FileFormat
    // by class name (lookupDataSource accepts it)
    val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    val tmp = graft.Staging.memoDir("graft_avro", dir) { tmp =>
      Tables(spark, dir, "nation").write.mode("overwrite")
        .format(fmt).save(tmp)
    }
    spark.read.format(fmt).load(tmp).orderBy("n_nationkey")
  }

  /** XML write + read-back (Spark 4 built-in XML source, ex spark-xml).
    * Values round-trip as element text; read-back casts through the
    * source schema because XML inference widens ints. The `rowTag`
    * option is the record framing — one element per row.
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val tmp = graft.Staging.memoDir("graft_xml", dir) { tmp =>
      nation.write.mode("overwrite").option("rowTag", "nation")
        .format("xml").save(tmp)
    }
    spark.read.option("rowTag", "nation").schema(nation.schema)
      .format("xml").load(tmp).orderBy("n_nationkey")
  }

  /** JSON-lines write + schema-on-read read-back (doubles survive via
    * shortest-roundtrip text encoding).
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "supplier")
    val tmp = graft.Staging.memoDir("graft_json", dir) { tmp =>
      region.write.mode("overwrite").json(tmp)
    }
    spark.read.schema(region.schema).json(tmp).orderBy("s_suppkey")
  }

  def jsonLines(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .orderBy("event_id")

  /** Partitioned parquet sink + read-back (no oracle — side effect). */
  def sinkParquet(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_sink", dir) { tmp =>
      Tables(spark, dir, "orders")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
    }
    spark.read.parquet(tmp)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** Line-oriented text roundtrip: serialize rows to delimited lines,
    * read back with spark.read.text + parse (the raw-log-ingest family;
    * deterministic side effect, oracle = source table).
    */
  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_text", dir) { tmp =>
      Tables(spark, dir, "nation")
        .select(concat_ws("\u0001",
          col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    val parts = split(col("value"), "\u0001")
    spark.read.text(tmp)
      .select(
        parts.getItem(0).cast("int").as("n_nationkey"),
        parts.getItem(1).as("n_name"),
        parts.getItem(2).cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** Hive-layout partitioned write + partition-PRUNED read-back: the scan
    * of one `event_type=` directory, not a filter over all of them. The
    * physical plan shows the predicate under PartitionFilters with zero
    * PushedFilters — at 100 TB this is the difference between reading one
    * partition and reading the corpus (asserted in ScansSpec).
    */
  def partitionPruned(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_prune", dir) { tmp =>
      Tables(spark, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .repartition(col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    }
    spark.read.parquet(tmp)
      .filter(col("event_type") === "purchase")
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("day")
  }

  /** `binaryFile` ingestion — the raw-bytes multimodal path: one opaque
    * blob per asset read as (path, length, content), keyed by an id parsed
    * from the filename. Fixture blobs are staged DRIVER-side
    * (toLocalIterator, one partition in memory at a time): the files
    * must land on the filesystem `binaryFile` will list, and an
    * executor-side foreachPartition write only coincides with it on
    * local[*] — on a real cluster it would scatter the blobs across
    * executor-local disks and the read would silently return zero rows.
    * Staging is fixture setup, not the measured operator. At 100 TB this
    * same scan shape reads image/audio shards; binaryFile never splits a
    * file, so a pre-bucketed many-files layout (not few giant blobs) is
    * what keeps tasks even.
    */
  def binaryFiles(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_bin", dir) { tmp =>
      val it = Tables(spark, dir, "documents")
        .filter(col("source") === "src0")
        .select(col("doc_id"), col("text"))
        .toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, s"doc_${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.read.format("binaryFile").load(tmp)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")
  }

  /** Hidden `_metadata` columns (file_name / file_size / row_index
    * family): per-file lineage available on ANY file-based scan without
    * touching the data schema — at 100 TB this is how per-shard audits,
    * incremental-load bookkeeping, and bad-file quarantine attribute rows
    * to their source files with zero extra bookkeeping columns. Grouping
    * by file here proves the column resolves and aggregates like any
    * other; the fixture is a single parquet file, so the oracle states
    * the expected (file_name, stats) row exactly.
    */
  def metadataCols(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("_metadata.file_name").as("file_name"))
      .agg(count(lit(1)).as("n_rows"),
        min("l_orderkey").as("min_key"),
        max("l_orderkey").as("max_key"))
      .orderBy("file_name")

  /** Range-clustered, sorted parquet sink: `repartitionByRange` assigns
    * disjoint key ranges to output files and `sortWithinPartitions`
    * orders rows inside each — so parquet row-group min/max stats become
    * selective and a later key-range scan skips whole files AND whole
    * row groups. At 100 TB this write-time clustering is the difference
    * between a point-range query reading one file and reading the fleet.
    * The oracle checks the round-trip is lossless; Round3cSpec reads the
    * `_metadata` stats back and asserts the per-file ranges really are
    * disjoint and internally sorted.
    */
  def clusteredWrite(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_cluster", dir) { tmp =>
      Tables(spark, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(tmp).orderBy("o_orderkey")
  }

  /** 16-bit Morton (Z-order) code of two 8-bit dimensions, generated as
    * one bitwise expression per dialect from the same bit layout — pure
    * codegen'd arithmetic, no UDF.
    */
  private[graft] def mortonSpark(x: String, y: String): String =
    (0 until 8).flatMap(i => Seq(
      s"shiftleft(shiftright($x % 256, $i) & 1, ${2 * i})",
      s"shiftleft(shiftright($y % 256, $i) & 1, ${2 * i + 1})"))
      .mkString(" | ")

  private[operators] def mortonDuck(x: String, y: String): String =
    (0 until 8).flatMap(i => Seq(
      s"((((($x) % 256) >> $i) & 1) << ${2 * i})",
      s"((((($y) % 256) >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" | ")

  /** Z-ORDER clustered sink: rows are written range-partitioned and
    * sorted by the Morton interleave of TWO key dimensions, so per-file
    * (and per-row-group) min/max stats are tight boxes in BOTH
    * dimensions at once — a selective filter on EITHER key skips most
    * files, which single-key clustering ([[clusteredWrite]]) can only do
    * for its one key. This is the multi-dimensional data-skipping layout
    * (Delta/Iceberg Z-ORDER) expressed with nothing but an expression +
    * repartitionByRange. The oracle re-states the interleave arithmetic
    * and checks the round-trip; Round3cSpec measures the per-file 2-D
    * bounding boxes and asserts they cover a small fraction of the key
    * space.
    */
  def zorderWrite(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_zorder", dir) { tmp =>
      Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          expr(mortonSpark("l_partkey", "l_suppkey")).as("z"))
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(tmp)
    }
    spark.read.parquet(tmp)
      .orderBy("z", "l_orderkey", "l_linenumber")
  }

  /** Schema evolution across partitioned writes: an old batch (3
    * columns) and a new batch (4 columns — `n_events` added) land in the
    * same dataset; `mergeSchema` unifies them at read time, back-filling
    * the missing column with nulls. At 100 TB schema DRIFT across
    * historical partitions is the norm, and merge-on-read beats
    * rewriting years of data. (mergeSchema scans all footers — at real
    * scale pin the unified schema explicitly; the read below states it
    * via the merged footer union, which is the same contract.)
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val tmp = graft.Staging.memoDir("graft_evo", dir) { tmp =>
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .write.mode("overwrite").parquet(tmp + "/batch=old")
      c.filter(col("c_custkey") % 2 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          (col("c_custkey") % 7).as("n_events"))
        .write.mode("overwrite").parquet(tmp + "/batch=new")
    }
    spark.read.option("mergeSchema", "true").parquet(tmp)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_events"), col("batch"))
      .orderBy("c_custkey")
  }

  /** Layout-tuned parquet sink: range-clustered files, zstd compression,
    * dictionary encoding, small row groups (`parquet.block.size`) — the
    * knobs that decide scan cost at 100 TB (row-group size bounds the
    * skip granularity; zstd trades ~10% cpu for ~30% smaller scans vs
    * snappy). Wave12Spec opens a footer and asserts the codec +
    * multiple row groups actually took effect; the key itself proves
    * the round-trip is lossless.
    */
  def parquetTuned(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_zstd", dir) { tmp =>
      Tables(spark, dir, "orders")
        .repartitionByRange(2, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("parquet.block.size", 256 * 1024)
        .parquet(tmp)
    }
    spark.read.parquet(tmp).orderBy("o_orderkey")
  }

  /** Parquet BLOOM-FILTER point-lookup skipping: the file is sorted by
    * o_orderkey, so o_custkey values scatter across every row group and
    * min/max zone maps are useless for a custkey probe — exactly the
    * shape where a bloom filter is the ONLY skip mechanism (dictionary
    * filtering is disabled on the staged file to keep the experiment
    * honest; bloom membership is what rules row groups out). Small
    * row groups (64 KiB) give the probe many skip opportunities; the
    * 100 TB version is the same two options on the daily sink, buying
    * O(row groups hit) point lookups on high-cardinality columns
    * without re-sorting the table. ScanMetricsSpec asserts the scan
    * reads strictly fewer rows than the bloom-less twin on the same
    * probe; this key's oracle covers the answer itself.
    */
  def parquetBloom(spark: SparkSession, dir: String): DataFrame = {
    val tmp = bloomStage(spark, dir, bloom = true)
    spark.read.parquet(tmp)
      .filter(col("o_custkey") === 42L)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Staged twice — with and without the bloom filter — so the spec can
    * compare rows actually scanned on identical data and probe. Small
    * row groups (16 KiB blocks) give the filter many groups to skip. */
  private[graft] def bloomStage(spark: SparkSession, dir: String,
      bloom: Boolean): String =
    graft.Staging.memoDir(s"graft_bloom_$bloom", dir) { tmp =>
      Tables(spark, dir, "orders")
        .repartition(1) // one file, many small row groups
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024)
        .option("parquet.enable.dictionary", "false")
        .option("parquet.bloom.filter.enabled#o_custkey", bloom.toString)
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
        .parquet(tmp)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet_bloom" -> parquetBloom,
    "sink_parquet_tuned" -> parquetTuned,
    "scan_avro_roundtrip" -> avroRoundtrip,
    "scan_xml_roundtrip" -> xmlRoundtrip,
    "scan_schema_evolution" -> schemaEvolution,
    "sink_zorder_write" -> zorderWrite,
    "scan_metadata_cols" -> metadataCols,
    "sink_clustered_write" -> clusteredWrite,
    "scan_binary_files" -> binaryFiles,
    "scan_partition_pruned" -> partitionPruned,
    "scan_text_roundtrip" -> textRoundtrip,
    "scan_parquet" -> scanParquet,
    "scan_pruned" -> scanPruned,
    "scan_csv_roundtrip" -> csvRoundtrip,
    "scan_orc_roundtrip" -> orcRoundtrip,
    "scan_json_roundtrip" -> jsonRoundtrip,
    "scan_json_lines" -> jsonLines,
    "sink_parquet" -> sinkParquet
  )

  def oracle: Map[String, String] = Map(
    "scan_parquet_bloom" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_custkey = 42 ORDER BY o_orderkey"),
    "sink_parquet_tuned" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "scan_avro_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "scan_xml_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "scan_schema_evolution" ->
      ("SELECT c_custkey, c_name, c_mktsegment, " +
        "CASE WHEN c_custkey % 2 = 0 THEN NULL " +
        "ELSE c_custkey % 7 END AS n_events, " +
        "CASE WHEN c_custkey % 2 = 0 THEN 'old' ELSE 'new' END AS batch " +
        "FROM customer ORDER BY c_custkey"),
    "sink_zorder_write" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        s"CAST(${mortonDuck("l_partkey", "l_suppkey")} AS BIGINT) AS z " +
        "FROM lineitem ORDER BY z, l_orderkey, l_linenumber"),
    "scan_metadata_cols" ->
      ("SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows, " +
        "min(l_orderkey) AS min_key, max(l_orderkey) AS max_key " +
        "FROM lineitem"),
    "sink_clustered_write" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    // the blobs are byte-exact renderings of documents.text, so byte
    // length and md5 are recomputable from the source rows
    "scan_binary_files" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS length, " +
        "md5(text) AS content_md5 " +
        "FROM documents WHERE source = 'src0' ORDER BY doc_id"),
    "scan_partition_pruned" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value " +
        "FROM events WHERE event_type = 'purchase' " +
        "GROUP BY 1 ORDER BY 1"),
    "scan_text_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_pruned" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_quantity",
    // the roundtrip/sink side effects are deterministic, so their
    // read-back results ARE oracle-checkable against the source tables
    "scan_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "scan_orc_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "scan_json_roundtrip" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "sink_parquet" ->
      ("SELECT o_orderstatus, count(*) AS n FROM orders " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "scan_json_lines" ->
      ("SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id")
  )
}
