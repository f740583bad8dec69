package graft

import org.apache.spark.sql.functions._

/** Round-3 late-wave operators: FILTER-clause aggregates, interval
  * arithmetic, SQL-defined UDFs, binaryFile ingestion, and runtime
  * bloom-filter join pruning. Bit-exactness is the oracle gate's job;
  * these tests assert the operator-specific invariants and plan shapes.
  */
class Round3cSpec extends GraftSuite {

  test("agg_filtered: conditional accumulators agree with explicit filters") {
    val r = operators.Aggregates.filteredAgg(spark, sf001).cache()
    val orders = Tables(spark, sf001, "orders")
    // FILTER (WHERE status='F') == count of the filtered slice, per group
    val expected = orders.filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("exp_f"))
    val joined = r.join(expected, Seq("o_orderpriority"), "left")
      .withColumn("exp_f", coalesce(col("exp_f"), lit(0L)))
    assert(joined.filter(col("n_finished") =!= col("exp_f")).count() == 0)
    // filtered counts can never exceed the group total
    assert(r.filter(col("n_finished") > col("n_orders")).count() == 0)
    assert(r.filter(col("n_big") > col("n_orders")).count() == 0)
    // fixture prices are all positive
    assert(r.filter(!col("all_positive")).count() == 0)
    r.unpersist()
  }

  test("agg_filtered: single aggregate pass, no join or expand in the plan") {
    val plan = operators.Aggregates.filteredAgg(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "conditional aggs must not become joins")
    assert(!plan.contains("Expand"), "FILTER clause must not expand rows")
  }

  test("fn_interval: minutes-since-midnight decomposes as 60h+m") {
    val r = functions.ScalarFns.fnInterval(spark, sf0001)
    assert(r.filter(col("min_of_day") =!= col("h") * 60 + col("mi"))
      .count() == 0)
    // +90min then -90min is identity: spot-check via reparse
    val bad = r.withColumn("back",
        date_format(to_timestamp(col("plus90m")) - expr("INTERVAL 90 MINUTE"),
          "yyyy-MM-dd HH:mm:ss"))
      .join(Tables(spark, sf0001, "events").select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("orig")), "event_id")
      .filter(col("back") =!= col("orig"))
    assert(bad.count() == 0)
  }

  test("udf_sql: SQL UDF body is inlined and codegen'd, result matches native") {
    val r = functions.Extensions.udfSql(spark, sf0001) // also registers the fns
    // (l_orderkey, l_linenumber) is NOT unique in the fixture, so compare
    // both forms inside ONE row rather than via a key join
    val both = Tables(spark, sf0001, "lineitem")
      .select(
        expr("graft_discounted(l_extendedprice, l_discount)").as("u"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("n"))
    assert(both.filter(col("u") =!= col("n")).count() == 0,
      "SQL UDF result diverges from inline expression")
    // inlining: no BatchEvalPython / ScalaUDF node — pure projection
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "SQL UDF must inline, not close over JVM code")
    assert(r.filter(!col("qty_band").isin("small", "mid", "bulk")).count() == 0)
  }

  test("scan_binary_files: blobs round-trip bytes and md5 from source rows") {
    val r = operators.Scans.binaryFiles(spark, sf0001).cache()
    val src = Tables(spark, sf0001, "documents")
      .filter(col("source") === "src0")
      .select(col("doc_id"), length(col("text")).cast("long").as("exp_len"),
        md5(col("text").cast("binary")).as("exp_md5"))
    assert(r.count() == src.count(), "one blob per src0 document")
    val bad = r.join(src, "doc_id")
      .filter(col("length") =!= col("exp_len") ||
        col("content_md5") =!= col("exp_md5"))
    assert(bad.count() == 0, "byte length / md5 mismatch after round-trip")
    r.unpersist()
  }

  test("join_dpp: fact scan carries a dynamic partition-pruning filter") {
    val df = operators.Joins.dppJoin(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no DPP filter on the partitioned fact scan:\n$plan")
    // only the two engagement partitions survive
    val types = df.select("event_type").collect().map(_.getString(0)).sorted
    assert(types.sameElements(Array("click", "view")))
  }

  test("etl_gap_fill: spine is dense, gaps are zero-count, LOCF never regresses") {
    val r = operators.Etl.gapFill(spark, sf0001).cache()
    // per user: row count == day span, i.e. no missing or duplicate days
    val spans = r.groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
    assert(spans.filter(col("n_rows") =!= col("span")).count() == 0)
    // gap rows carry zero events and a non-null carried value
    assert(r.filter(col("is_gap") &&
      (col("n_events") =!= 0 || col("carried_value").isNull)).count() == 0)
    r.unpersist()
  }

  test("etl_malformed_split: corrupt rows quarantined, clean rows parse fully") {
    val r = operators.Etl.malformedSplit(spark, sf0001).cache()
    val dead = r.filter(col("is_dead_letter"))
    assert(dead.count() == r.filter(col("n_nationkey") % 7 === 0).count())
    assert(dead.filter(col("n_regionkey").isNotNull).count() == 0,
      "malformed field must be nulled")
    assert(dead.filter(!col("raw_line").contains(",bad")).count() == 0,
      "dead letter must carry the raw line")
    assert(r.filter(!col("is_dead_letter") && (col("n_regionkey").isNull ||
      col("raw_line").isNotNull)).count() == 0)
    r.unpersist()
  }

  test("agg_approx_percentile: sketch quartiles bound the exact ones") {
    val approx = operators.Aggregates.approxPercentile(spark, sf001)
    val exact = Tables(spark, sf001, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")
        .as("exact_p50"))
    val bad = approx.join(exact, "l_returnflag")
      .filter(abs(col("p50") - col("exact_p50")) >
        col("exact_p50") * 0.02)
    assert(bad.count() == 0, "approx p50 off by more than 2%")
    assert(approx.filter(col("p25") > col("p50") || col("p50") > col("p75"))
      .count() == 0, "quartiles must be ordered")
  }

  test("sink_clustered_write: file key-ranges are disjoint and sorted inside") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_cluster_t").toString
    Tables(spark, sf001, "orders")
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(tmp)
    val stats = spark.read.parquet(tmp)
      .groupBy(col("_metadata.file_name").as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .orderBy("lo").collect()
    assert(stats.length == 8, s"expected 8 clustered files, got ${stats.length}")
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1),
        s"overlapping file ranges: $a vs $b")
    }
    // rows inside one file are sorted (row order == key order)
    val one = spark.read.parquet(tmp)
      .filter(col("_metadata.file_name") === stats.head.getString(0))
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(one.sameElements(one.sorted), "rows not sorted within file")
  }

  test("llm_bpe_merge_step: top pair count equals a direct recount") {
    val r = llm.TextOps.bpeMergeStep(spark, sf0001).collect()
    assert(r.length == 20)
    assert(r.map(_.getLong(2)).sliding(2).forall(p => p(0) >= p(1)),
      "counts must be non-increasing by rank")
    val top = r.head
    val direct = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("p"))
      .filter(col("p") === top.getString(1)).count()
    assert(direct == top.getLong(2), "top pair count mismatch")
  }

  test("llm_sample_weighted: per-source sample fraction tracks the weight") {
    val sampled = llm.Pipeline.sampleWeighted(spark, sf001)
      .groupBy("source", "wt").agg(count(lit(1)).as("n_kept"))
    val totals = Tables(spark, sf001, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_src"))
    val bad = sampled.join(totals, "source")
      .filter(col("n_kept") =!=
        expr("CAST((n_src * wt + 7) div 8 AS BIGINT)"))
    assert(bad.count() == 0, "quota not honored exactly")
  }

  test("llm_corpus_pipeline: manifest accounts for every surviving doc exactly once") {
    val manifest = llm.Pipeline.corpusPipeline(spark, sf001).collect()
    assert(manifest.nonEmpty && manifest.length <= 8)
    // recompute the survivor set stage by stage and compare totals
    val docs = Tables(spark, sf001, "documents")
      .withColumn("canon", lower(trim(regexp_replace(col("text"), " +", " "))))
      .withColumn("w", split(col("canon"), " "))
      .filter(size(col("w")).between(30, 90) &&
        (array_contains(col("w"), "the") || array_contains(col("w"), "a")))
    val surv = docs.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("canon"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .filter(((col("doc_id") % 2147483648L) * 1103515245L + 12345L)
        % 2147483648L % 4 =!= 0)
    assert(manifest.map(_.getLong(1)).sum == surv.count(),
      "per-shard doc counts must sum to the survivor count")
    // shards partition the survivors: no doc counted twice
    assert(manifest.map(_.getLong(0)).distinct.length == manifest.length)
  }

  test("graph_pagerank_step: mass is conserved up to integer-floor loss") {
    val r = llm.GraphOps.pagerankStep(spark, sf001).collect()
    val nUsers = Tables(spark, sf001, "events")
      .select("user_id").distinct().count()
    val inflow = r.map(_.getLong(2)).sum
    val emitted = nUsers * 1000000L
    // div-floor loses < deg units per user (deg <= 5)
    assert(inflow <= emitted && inflow > emitted - nUsers * 5,
      s"mass not conserved: emitted $emitted, arrived $inflow")
    // every item collected from at least one user
    assert(r.forall(_.getLong(1) > 0))
  }

  test("sink_zorder_write: per-file boxes are tight in BOTH dimensions") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_zorder_t").toString
    val morton = (0 until 8).flatMap(i => Seq(
      s"shiftleft(shiftright(l_partkey % 256, $i) & 1, ${2 * i})",
      s"shiftleft(shiftright(l_suppkey % 256, $i) & 1, ${2 * i + 1})"))
      .mkString(" | ")
    Tables(spark, sf001, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), expr(morton).as("z"))
      .repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(tmp)
    val boxes = spark.read.parquet(tmp)
      .select(col("_metadata.file_name").as("f"),
        (col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
      .groupBy("f")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
        .as("area"))
      .collect().map(_.getLong(1))
    assert(boxes.length == 8)
    // a contiguous 1/8 z-range is ~2 Morton cells of 128x64: every box
    // must be far below the full 256x256 space, unlike a random split
    assert(boxes.forall(_ < 256 * 256 / 2),
      s"a file's 2-D box covers half the key space: ${boxes.mkString(",")}")
    assert(boxes.sum < 256 * 256 * 2,
      s"total box coverage too loose: ${boxes.sum}")
  }

  test("llm_dedup_edit_distance: banded join equals the unblocked theta join") {
    val banded = llm.DedupVariants.editDistance(spark, sf0001)
    val d = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        substring(col("text"), 1, 64).as("pfx"))
    val a = d.select(col("doc_id").as("id"), col("lang"),
      col("n_chars").as("nc"), col("pfx").as("pa"))
    val b = d.select(col("doc_id").as("cid"), col("lang"),
      col("n_chars").as("cnc"), col("pfx").as("pb"))
    val naive = a.join(b, Seq("lang"))
      .filter(col("id") =!= col("cid") && abs(col("nc") - col("cnc")) <= 4)
      .groupBy("id").agg(count(lit(1)).as("n_candidates"))
    val joined = banded.join(naive, banded("doc_id") === naive("id"), "left")
      .filter(banded("n_candidates") =!= coalesce(naive("n_candidates"), lit(0L)))
    assert(joined.count() == 0, "banding lost or duplicated candidate pairs")
    // exact duplicate texts (if any) must show distance 0
    assert(banded.filter(col("min_dist") < 0).count() == 0)
  }

  test("etl_snapshot_diff: every change class present and correctly typed") {
    val r = operators.Etl.snapshotDiff(spark, sf001).cache()
    val byType = r.groupBy("change_type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byType.keySet == Set("added", "removed", "changed"))
    val orders = Tables(spark, sf001, "orders")
    assert(byType("removed") ==
      orders.filter(col("o_orderkey") % 97 === 0).count())
    assert(byType("added") ==
      orders.filter(col("o_orderkey") % 89 === 0).count())
    // changed = repriced keys that were not also deleted
    assert(byType("changed") == orders
      .filter(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 97 =!= 0)
      .count())
    assert(r.filter(col("change_type") === "added" &&
      col("old_price").isNotNull).count() == 0)
    r.unpersist()
  }

  test("win_rolling_median: matches a brute-force frame median") {
    val r = operators.Windows.rollingMedian(spark, sf0001)
    // brute force one user: frame of last 5 cents, median by hand
    val uid = r.select("user_id").first().getLong(0)
    val rows = Tables(spark, sf0001, "events")
      .filter(col("user_id") === uid)
      .select(col("event_id"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .orderBy("ts", "event_id") // the query's frame order
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val got = r.filter(col("user_id") === uid)
      .select("event_id", "rolling_median").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    rows.indices.foreach { i =>
      val frame = rows.slice(math.max(0, i - 4), i + 1).map(_._2).sorted
      val m =
        if (frame.length % 2 == 1) frame(frame.length / 2).toDouble
        else (frame(frame.length / 2 - 1) + frame(frame.length / 2)) / 2.0
      assert(got(rows(i)._1) == m / 100.0,
        s"median mismatch at event ${rows(i)._1}")
    }
  }

  test("plan_cache_reuse: second branch reads the InMemoryRelation") {
    val df = operators.Aggregates.cacheReuse(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"branches must consume the persisted base:\n$plan")
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.count(_.getString(0) == "top") == 5)
  }

  test("llm_dataset_card: subtotal rows reconcile with the grand total") {
    val card = llm.CorpusOps.datasetCard(spark, sf0001).collect()
    val grand = card.filter(r => r.getInt(6) == 1 && r.getInt(7) == 1)
    assert(grand.length == 1)
    val leaves = card.filter(r => r.getInt(6) == 0 && r.getInt(7) == 0)
    assert(leaves.map(_.getLong(2)).sum == grand.head.getLong(2))
    assert(leaves.map(_.getLong(3)).sum == grand.head.getLong(3))
    val langSub = card.filter(r => r.getInt(6) == 0 && r.getInt(7) == 1)
    assert(langSub.map(_.getLong(2)).sum == grand.head.getLong(2))
  }

  test("sql_tpch_q5: SQL text plans like the DataFrame chain (broadcast dims)") {
    val df = operators.SqlSurface.tpchQ5(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"dims should broadcast:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 0))
  }

  test("win_distinct_running: never decreases and ends at the user's true distinct count") {
    val r = operators.Windows.distinctRunning(spark, sf0001)
    // the frame order is (ts, event_id), which may interleave with the
    // output's event_id order — so check the per-user endpoint
    val finals = r.groupBy("user_id")
      .agg(max("distinct_types_so_far").as("got"))
    val truth = Tables(spark, sf0001, "events")
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("want"))
    assert(finals.join(truth, "user_id")
      .filter(col("got") =!= col("want")).count() == 0)
  }

  test("llm_tokenize_regex: contractions, numbers, punctuation split correctly") {
    import spark.implicits._
    val df = Seq((1L, "the cat's 42 hats, ok!")).toDF("doc_id", "text")
    val toks = df.withColumn("toks", expr(
        """regexp_extract_all(text, "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+", 0)"""))
      .select(array_join(col("toks"), "|")).head.getString(0)
    assert(toks == "the| cat|'s| 42| hats|,| ok|!", toks)
    // corpus sanity: regex token count >= whitespace token count
    val r = llm.TextQuality.tokenizeRegex(spark, sf0001)
      .join(Tables(spark, sf0001, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ws")),
        "doc_id")
    assert(r.filter(col("n_regex_tokens") < col("ws")).count() == 0)
  }

  test("Tuning.confs sizes partitions to cores and keeps AQE + skew handling on") {
    val c = plans.Tuning.confs(cores = 4000)
    assert(c("spark.sql.shuffle.partitions") == "12000")
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.files.maxPartitionBytes").toLong == 256L << 20)
  }

  test("join_bloom_runtime: bloom probe injected under thresholds, result unchanged") {
    val conf = spark.conf
    // injection requires a creation side that is NOT broadcastable-by-size
    // (Spark's isProbablyShuffleJoin treats a broadcastable build side as
    // already-pruning); true at 100 TB, forced here via the threshold
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "0")
      conf.set(keys(1), "100MB")
      conf.set(keys(2), "-1")
      val df = operators.Joins.bloomRuntime(spark, sf001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      val withBloom = df.collect()
      // restore defaults -> no injection; results must be identical
      saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _))
      }
      val without = operators.Joins.bloomRuntime(spark, sf001)
      assert(!without.queryExecution.executedPlan.toString
        .toLowerCase.contains("might_contain"))
      assert(withBloom.sameElements(without.collect()),
        "bloom filter must be semantically transparent")
    } finally {
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }
}
