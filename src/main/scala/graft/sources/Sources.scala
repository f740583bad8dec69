package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Query-surface wiring for the native DSv2 connectors. */
object Sources {

  /** Fixed-width roundtrip through [[FixedWidthDataSource]]: render the
    * nation dim as fixed-width lines, read back through the V2 connector,
    * and select a strict subset of fields — the point is that column
    * pruning reaches the connector (`FixedWidthScan(n_nationkey,n_name)`
    * in the plan; asserted in SourcesSpec), so the unused byte range is
    * never parsed.
    */
  def fixedWidthDsv2(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_fw2", dir) { tmp =>
      Tables(spark, dir, "nation")
        .select(format_string("%-4d%-20s%-4d",
          col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    spark.read
      .format("graft.sources.FixedWidthDataSource")
      .option("fields",
        "n_nationkey:1:4:int,n_name:5:20:string,n_regionkey:25:4:int")
      .load(tmp)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey")
  }

  /** The same connector with FILTER pushdown
    * ([[FixedWidthScanBuilder.pushFilters]]): the predicate runs inside
    * the line reader, so filtered records never materialize as rows, and
    * the filter-only column (`n_regionkey` here) is parsed for the test
    * but never occupies an output slot. The plan shows the predicates
    * under `pushed=[…]` in the scan description with NO Spark-side
    * Filter re-check for the pushed conjuncts (asserted in SourcesSpec).
    */
  def fixedWidthFiltered(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_fw3", dir) { tmp =>
      Tables(spark, dir, "nation")
        .select(format_string("%-4d%-20s%-4d",
          col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    spark.read
      .format("graft.sources.FixedWidthDataSource")
      .option("fields",
        "n_nationkey:1:4:int,n_name:5:20:string,n_regionkey:25:4:int")
      .load(tmp)
      .filter(col("n_regionkey") === 1 && col("n_nationkey") >= 5)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey")
  }

  /** LIMIT pushdown ([[FixedWidthScanBuilder.pushLimit]]): the reader
    * stops consuming the file after `limit` emitted records instead of
    * scanning to EOF — partial pushdown, so Spark's global Limit stays on
    * top (correct across multi-file scans). The fixture is one sorted
    * file, so "first 10 records" is the 10 lowest keys and the key is
    * oracle-able; the plan shows `limit=10` in the scan description
    * (asserted in SourcesSpec).
    */
  def fixedWidthLimit(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_fw4", dir) { tmp =>
      Tables(spark, dir, "nation").orderBy("n_nationkey").coalesce(1)
        .select(format_string("%-4d%-20s%-4d",
          col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    spark.read
      .format("graft.sources.FixedWidthDataSource")
      .option("fields",
        "n_nationkey:1:4:int,n_name:5:20:string,n_regionkey:25:4:int")
      .load(tmp)
      .limit(10)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy("n_nationkey")
  }

  /** AGGREGATE pushdown ([[FixedWidthScanBuilder.pushAggregation]]): a
    * global COUNT(*)/MIN/MAX over the connector collapses inside each
    * partition reader — the scan emits ONE partial row per file and
    * Spark's final HashAggregate merges them, instead of every record
    * crossing the source boundary. The money column rides as exact
    * integer cents so the fixed-width render loses nothing. The scan
    * description shows `pushedAggs=[COUNT(*), MIN(o_cents),
    * MAX(o_cents)]` with the filter also pushed (asserted in
    * SourcesSpec).
    */
  def fixedWidthAgg(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_fw5", dir) { tmp =>
      Tables(spark, dir, "orders")
        .select(format_string("%-12d%-12d%-14d",
          col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100, 0).cast("long")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    spark.read
      .format("graft.sources.FixedWidthDataSource")
      .option("fields",
        "o_orderkey:1:12:long,o_custkey:13:12:long,o_cents:25:14:long")
      .load(tmp)
      .filter(col("o_custkey") >= 100)
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_cents")).as("min_cents"),
        max(col("o_cents")).as("max_cents"))
  }

  /** STORAGE-PARTITIONED JOIN through the connector's reported
    * partitioning: orders and customer are laid out hive-style
    * (`grp=<k>/…`, grp = custkey % 8) as fixed-width text, the scans
    * report [[graft.sources.FixedWidthPartitionedScanKeyGroupedPartitioning]]
    * on `grp`, and with `spark.sql.sources.v2.bucketing.enabled` BOTH
    * per-side aggregations AND the join plan with no Exchange anywhere
    * below the final presentation sort (asserted in SourcesSpec). The
    * merge hint keeps the tiny fixture off the broadcast path so the
    * exchange-free co-partitioned plan is what actually runs — at lake
    * scale this is the write-once-shuffle-never-again bucketed layout.
    */
  def storagePartitionedJoin(spark: SparkSession, dir: String): DataFrame = {
    // needed at ACTION time (planning is lazy, so a try/finally restore
    // here would undo it before the caller executes). Verify/Bench set it
    // in the session builder; this set makes the key self-contained on a
    // bare session and is a no-op there.
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val tmpO = graft.Staging.memoDir("graft_spj_o", dir) { tmpO =>
      Tables(spark, dir, "orders")
        .withColumn("grp", col("o_custkey") % 8)
        .select(format_string("%-12d%-14d",
          col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long")).as("value"),
          col("grp"))
        .write.partitionBy("grp").mode("overwrite").text(tmpO)
    }
    val tmpC = graft.Staging.memoDir("graft_spj_c", dir) { tmpC =>
      Tables(spark, dir, "customer")
        .withColumn("grp", col("c_custkey") % 8)
        .select(format_string("%-12d", col("c_custkey")).as("value"),
          col("grp"))
        .write.partitionBy("grp").mode("overwrite").text(tmpC)
    }
    val o = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", "o_orderkey:1:12:long,o_cents:13:14:long")
      .option("partcol", "grp").load(tmpO)
    val c = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", "c_custkey:1:12:long")
      .option("partcol", "grp").load(tmpC)
    val oa = o.groupBy("grp").agg(count(lit(1)).as("n_orders"),
      (sum("o_cents").cast("double") / 100).as("revenue"))
    val ca = c.groupBy("grp").agg(count(lit(1)).as("n_customers"))
    oa.hint("merge").join(ca, Seq("grp"))
      .select("grp", "n_orders", "revenue", "n_customers")
      .orderBy("grp")
  }

  /** WRITE through the connector's V2 BatchWrite path
    * ([[FixedWidthWriteBuilder]] — task-staged files, driver-side
    * rename commit, truncate-on-overwrite), then read the layout back
    * through the SAME connector and aggregate. Exercises the full
    * two-phase commit protocol end-to-end; the aggregate restates over
    * the source table, so a dropped / duplicated / half-renamed task
    * file fails the oracle hash, not just a row count. Monetary values
    * ride the integer-cent grid through the text roundtrip.
    */
  def fixedWidthSink(spark: SparkSession, dir: String): DataFrame = {
    val spec = "s_suppkey:1:8:long,s_nationkey:9:4:long,s_cents:13:14:long"
    // Staging.tempDir (not a raw createTempDirectory): fresh-per-call
    // semantics, but registered for exit-time cleanup — the raw form
    // leaked one supplier render per bench rep
    val tmp = graft.Staging.tempDir("graft_fwsink")
    Tables(spark, dir, "supplier")
      .select(col("s_suppkey"),
        col("s_nationkey").cast("long").as("s_nationkey"),
        round(col("s_acctbal") * 100, 0).cast("long").as("s_cents"))
      .write.format("graft.sources.FixedWidthDataSource")
      .option("fields", spec)
      .mode("overwrite")
      .save(tmp)
    spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", spec)
      .load(tmp)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        min("s_suppkey").as("min_suppkey"),
        max("s_suppkey").as("max_suppkey"),
        sum("s_cents").as("sum_cents"))
      .orderBy("s_nationkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_fixed_width" -> fixedWidthSink,
    "scan_fixed_width_limit" -> fixedWidthLimit,
    "scan_fixed_width_filtered" -> fixedWidthFiltered,
    "scan_fixed_width_agg" -> fixedWidthAgg,
    "join_storage_partitioned" -> storagePartitionedJoin,
    "scan_fixed_width_dsv2" -> fixedWidthDsv2
  )

  def oracle: Map[String, String] = Map(
    "sink_fixed_width" ->
      ("SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, " +
        "count(*) AS n_suppliers, " +
        "min(s_suppkey) AS min_suppkey, max(s_suppkey) AS max_suppkey, " +
        "CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
        "FROM supplier GROUP BY 1 ORDER BY 1"),
    "scan_fixed_width_limit" ->
      ("SELECT n_nationkey, n_name FROM nation " +
        "ORDER BY n_nationkey LIMIT 10"),
    "scan_fixed_width_filtered" ->
      ("SELECT n_nationkey, n_name FROM nation " +
        "WHERE n_regionkey = 1 AND n_nationkey >= 5 ORDER BY n_nationkey"),
    "scan_fixed_width_dsv2" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "scan_fixed_width_agg" ->
      ("SELECT count(*) AS n_orders, " +
        "min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents, " +
        "max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents " +
        "FROM orders WHERE o_custkey >= 100"),
    "join_storage_partitioned" ->
      ("WITH o AS (SELECT o_custkey % 8 AS grp, count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) " +
        "/ 100 AS revenue FROM orders GROUP BY 1), " +
        "c AS (SELECT c_custkey % 8 AS grp, count(*) AS n_customers " +
        "FROM customer GROUP BY 1) " +
        "SELECT grp, n_orders, revenue, n_customers " +
        "FROM o JOIN c USING (grp) ORDER BY grp")
  )
}
