package graft

import org.apache.spark.sql.functions._

/** Native DSv2 fixed-width connector: roundtrip fidelity + column
  * pruning reaching the connector's scan.
  */
class SourcesSpec extends GraftSuite {

  test("dsv2 fixed-width roundtrips nation exactly") {
    val back = sources.Sources.fixedWidthDsv2(spark, sf0001)
    val ref = Tables(spark, sf0001, "nation")
      .select(col("n_nationkey").cast("int"), col("n_name"))
      .orderBy("n_nationkey")
    assert(back.collect().toSeq == ref.collect().toSeq)
  }

  test("column pruning reaches the V2 scan (only selected fields parsed)") {
    val df = sources.Sources.fixedWidthDsv2(spark, sf0001)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("FixedWidthScan(n_nationkey,n_name)"), scan)
    assert(!scan.contains("n_regionkey"), scan)
  }

  test("filter pushdown reaches the V2 reader; filter column stays pruned") {
    val df = sources.Sources.fixedWidthFiltered(spark, sf0001)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("pushed=["), scan)
    assert(scan.contains("EqualTo(n_regionkey,1)"), scan)
    assert(scan.contains("GreaterThanOrEqual(n_nationkey,5)"), scan)
    // output schema excludes the filter-only column
    assert(df.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
    // reader-side evaluation is correct vs the plain-parquet answer
    val expect = Tables(spark, sf0001, "nation")
      .filter(col("n_regionkey") === 1 && col("n_nationkey") >= 5)
      .select("n_nationkey", "n_name").orderBy("n_nationkey").collect()
    assert(df.collect().sameElements(expect))
  }

  test("limit pushdown reaches the V2 scan and bounds the reader") {
    val df = sources.Sources.fixedWidthLimit(spark, sf0001)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("limit=10"), scan)
    // partial pushdown: Spark's own Limit must STAY in the plan
    assert(df.queryExecution.executedPlan.toString.contains("Limit"),
      df.queryExecution.executedPlan.toString)
    assert(df.collect().map(_.getInt(0)).toSeq == (0 until 10))
  }

  test("reported statistics let the planner broadcast the V2 dim") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fw_stats").toString
    Tables(spark, sf0001, "nation")
      .select(format_string("%-4d%-20s%-4d",
        col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
      .write.mode("overwrite").text(tmp)
    val dim = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields",
        "n_nationkey:1:4:int,n_name:5:20:string,n_regionkey:25:4:int")
      .load(tmp)
    // planner-visible size must be the real ~725 bytes, not the
    // "unknown source" default
    val stats = dim.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < 100000, stats.sizeInBytes.toString)
    // and a join against a fact auto-broadcasts the V2 side (no hint)
    val joined = Tables(spark, sf0001, "customer")
      .join(dim, col("c_nationkey") === col("n_nationkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("all-column read and type parsing work through the spec") {
    val tmpDf = sources.Sources.fixedWidthDsv2(spark, sf0001)
    assert(tmpDf.schema.map(_.dataType.typeName) == Seq("integer", "string"))
    // malformed/short lines parse to nulls, not exceptions
    val tmp = java.nio.file.Files.createTempDirectory("graft_fw_bad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "x.txt"),
      "7   ONLYKEY\n".getBytes)
    val r = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", "k:1:4:int,name:5:20:string,extra:25:4:int")
      .load(tmp)
    val row = r.head
    assert(row.getInt(0) == 7 && row.getString(1) == "ONLYKEY" && row.isNullAt(2))
  }

  test("aggregate pushdown: one partial row per file, results equal the raw aggregate") {
    val df = sources.Sources.fixedWidthAgg(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggs=[COUNT(*), MIN(o_cents), MAX(o_cents)]"), plan)
    // the filter was consumed by the source too (prerequisite for the push)
    assert(plan.contains("GreaterThanOrEqual(o_custkey,100)"), plan)
    val row = df.head
    // same numbers computed without the connector
    val direct = Tables(spark, sf0001, "orders")
      .filter(col("o_custkey") >= 100)
      .agg(count(lit(1)), min(round(col("o_totalprice") * 100, 0).cast("long")),
        max(round(col("o_totalprice") * 100, 0).cast("long"))).head
    assert(row.getLong(0) == direct.getLong(0))
    assert(row.getLong(1) == direct.getLong(1))
    assert(row.getLong(2) == direct.getLong(2))
  }

  test("storage-partitioned join: zero exchanges below the presentation sort") {
    val df = sources.Sources.storagePartitionedJoin(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the reported KeyGroupedPartitioning must reach the plan
    assert(plan.contains("keyGrouped=[grp]"), plan)
    // join + both aggregations run on the scan partitioning: the ONLY
    // Exchange is the final orderBy's rangepartitioning
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalPlan).size
    assert(exchanges == 1, s"expected 1 exchange (presentation sort), got $exchanges:\n$finalPlan")
    assert(finalPlan.contains("rangepartitioning"), finalPlan)
    // and the answer matches a direct parquet-side computation
    val direct = Tables(spark, sf0001, "orders")
      .groupBy((col("o_custkey") % 8).as("grp"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("grp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == direct)
  }

  test("V2 write path: staged-rename commit, clean layout, overwrite truncates") {
    val spec = "k:1:8:long,v:9:12:string"
    val tmp = java.nio.file.Files.createTempDirectory("graft_fwwrite").toString
    def writeRange(n: Int): Unit =
      spark.range(n).select(col("id").as("k"),
          concat(lit("val"), col("id")).as("v"))
        .write.format("graft.sources.FixedWidthDataSource")
        .option("fields", spec).mode("overwrite").save(tmp)
    writeRange(100)
    val dir = new java.io.File(tmp)
    val names = dir.listFiles().map(_.getName)
    // commit renamed every staged file into place and swept the staging dir
    assert(names.forall(n => n.startsWith("part-") && n.endsWith(".txt")), names.toSeq)
    assert(!names.exists(_.startsWith("_staging")), names.toSeq)
    val back = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", spec).load(tmp)
    assert(back.count() === 100)
    assert(back.agg(sum("k")).head.getLong(0) === (0L until 100).sum)
    // overwrite must TRUNCATE: the second, smaller write fully replaces
    writeRange(7)
    val again = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", spec).load(tmp)
    assert(again.count() === 7)
    assert(again.select("v").collect().map(_.getString(0)).sorted.head === "val0")
    // an EMPTY overwrite is a valid truncate: zero rows, clean layout
    writeRange(0)
    val empty = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("fields", spec).load(tmp)
    assert(empty.count() === 0)
    assert(!new java.io.File(tmp).listFiles().exists(_.getName.startsWith("_staging")))
  }
}
