package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.3 — join shapes.
  *
  * Scale notes (100 TB):
  *  - dims (region/nation/supplier/part at star-schema ratios) are
  *    `broadcast()` so fact-side data never shuffles for them;
  *  - the as-of join is the union-window formulation — one shuffle on
  *    `user_id`, no per-row range probe, no cross product — the standard
  *    scalable as-of pattern;
  *  - the interval join broadcasts the (tiny) per-user anchor table; the
  *    residual BETWEEN runs as a post-join filter on an equi-join, never
  *    a cartesian;
  *  - full-outer is taken over pre-aggregated keys, not raw fact rows, so
  *    the shuffle carries one row per key.
  */
object Joins {

  def innerEqui(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  def broadcastDims(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    l.join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  def leftOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey")
  }

  def fullOuter(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables(spark, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    val b = Tables(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    a.join(b, a("o_custkey") === b("user_id"), "full_outer")
      .select(coalesce(a("o_custkey"), b("user_id")).as("id"),
        col("n_orders"), col("n_events"))
      .orderBy("id")
  }

  def rightOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        max(col("o_orderdate")).isNotNull.as("has_orders"))
      .orderBy("c_custkey")
  }

  def semi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** NOT EXISTS — customers with no 'P'-status order (predicate chosen so
    * the result is non-empty at every sf; plain "no orders at all" is
    * empty at sf0.001).
    */
  def anti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders").filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Equi key + range residual — planned as a hash join with a post-join
    * filter, never a cartesian.
    */
  def thetaRange(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    l.join(broadcast(p),
        l("l_partkey") === p("p_partkey") && l("l_quantity") > p("p_size"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), round(avg("l_quantity"), 4).as("avg_qty"))
      .orderBy("p_brand")
  }

  def cross(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "region")
      .crossJoin(Tables(spark, dir, "nation"))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  /** As-of: each purchase matched to the latest preceding signup of the
    * same user. Union-window formulation: tag candidate timestamps, one
    * window pass ordered by (ts, event_id) — a single shuffle on user_id.
    */
  def asof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("signup_ts", when(col("event_type") === "signup", col("ts")))
      .withColumn("asof_signup", last("signup_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("asof_signup")).as("signup_ts_us"))
      .orderBy("event_id")
  }

  /** NEAREST-match as-of: each purchase matched to the closest signup of
    * the same user in EITHER time direction (sensor-alignment semantics,
    * vs [[asof]]'s backward-only match). Same union-window shape — one
    * shuffle on user_id, two frame passes over the identical sort (the
    * backward candidate via last-ignoreNulls over the preceding frame,
    * the forward via first-ignoreNulls over the following frame; Spark
    * plans ONE Sort for both) — then a pure projection picks the smaller
    * absolute distance, backward winning ties. No join node at all; at
    * 100 TB this is one partitioned window scan, never an expanding
    * theta join.
    */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val back = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tsUs = unix_micros(col("ts"))
    val backUs = unix_micros(col("back_ts"))
    val fwdUs = unix_micros(col("fwd_ts"))
    val backWins = col("back_ts").isNotNull &&
      (col("fwd_ts").isNull || (tsUs - backUs) <= (fwdUs - tsUs))
    e.withColumn("signup_ts", when(col("event_type") === "signup", col("ts")))
      .withColumn("back_ts", last("signup_ts", ignoreNulls = true).over(back))
      .withColumn("fwd_ts", first("signup_ts", ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
        when(backWins, backUs).otherwise(fwdUs).as("nearest_us"),
        when(col("back_ts").isNull && col("fwd_ts").isNull, lit(null))
          .when(backWins, lit("backward")).otherwise(lit("forward"))
          .cast("string").as("direction"))
      .orderBy("event_id")
  }

  /** Interval join: events within ±30 min of each user's first signup. */
  def interval(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val anchors = Tables(spark, dir, "events")
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("anchor_ts"))
    e.join(broadcast(anchors), Seq("user_id"))
      .filter(col("ts") >= col("anchor_ts") - expr("INTERVAL 30 MINUTE") &&
        col("ts") <= col("anchor_ts") + expr("INTERVAL 30 MINUTE"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("anchor_ts")).as("anchor_us"))
      .orderBy("event_id")
  }

  /** TPC-H Q3 shape: 3-way join, aggregate, top-10 by revenue. */
  def multiway(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Bucket-co-located join: both sides written bucketed+sorted on the
    * join key (8 buckets), then sort-merge-joined with NO exchange on
    * either side — the plan Spark produces when bucketing lines up, and
    * the way a 100 TB fact/fact join avoids reshuffling every run. The
    * merge hint keeps AQE from demoting to broadcast at toy scale so
    * the exchange-free SMJ is what actually executes (asserted in
    * RelationalSpec).
    */
  def bucketed(spark: SparkSession, dir: String): DataFrame = {
    def freshBucketTable(name: String, src: String, key: String,
        cols: Seq[String]): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // a previous JVM may have left the managed location behind; the
      // in-memory catalog won't overwrite an unknown location
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, name)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
      // project to the join/agg columns before bucketing — the bucketed
      // layout is a purpose-built co-location artifact, not a table copy
      Tables(spark, dir, src).select(cols.map(col): _*)
        .write.mode("overwrite")
        .format("parquet").bucketBy(8, key).sortBy(key)
        .saveAsTable(name)
      // per-JVM names never get overwritten by a later run — delete the
      // staged files at exit so the shared warehouse doesn't accumulate
      // one table pair per process
      graft.Staging.registerForCleanup(new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name).toUri.getPath)
    }
    // per-JVM-unique staging names: the warehouse dir is shared
    // (java.io.tmpdir), and two concurrent graft JVMs (e.g. a test run
    // beside a Verify run) racing on ONE fixed table path produce
    // FAILED_READ_FILE when the reader's cached file listing outlives
    // the writer's overwrite — caught live by Verify's _failed.json at
    // r7. The oracle restates the join over the raw parquet, so the
    // staged name is free to vary per process.
    val pid = ProcessHandle.current().pid()
    // per-dir suffix beside the pid: the staging is memoized per
    // (JVM, dir) below, and one JVM can run several SFs (tests)
    val dh = java.lang.Integer.toHexString(dir.hashCode)
    val ordersBkt = s"orders_bkt_${pid}_$dh"
    val customerBkt = s"customer_bkt_${pid}_$dh"
    // The bucketed pair is a LAYOUT fixture — what the key measures is
    // the exchange-free co-located SMJ, not the bucketing write. Staged
    // once per (JVM, dir) like join_storage_partitioned's hive layout
    // (the r4 memoDir precedent), so bench rep 2+ times the join
    // (r16 opt: 1.27 s → the join alone).
    graft.Staging.once(s"graft_bkt|$dir") {
      freshBucketTable(ordersBkt, "orders", "o_custkey",
        Seq("o_custkey", "o_totalprice"))
      freshBucketTable(customerBkt, "customer", "c_custkey",
        Seq("c_custkey", "c_mktsegment"))
    }
    spark.table(ordersBkt).hint("merge")
      .join(spark.table(customerBkt).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")
  }

  /** SELECTIVELY salted skew join — the production pattern: detect the
    * hot keys first, salt ONLY those (probe side gets a deterministic
    * salt in [0, 8), build side replicates ×8 for just the hot keys),
    * and run the long cold tail as a plain equi-join; union before the
    * final aggregate. Replication cost scales with the skew, not the
    * table. The hot set is a broadcast dimension for routing both sides;
    * at 100 TB it comes from a sampled frequency sketch instead of an
    * exact count, and the threshold is partition-size/heap driven. The
    * salt derives from data (`pmod(l_linenumber, 8)`), not rand(), and
    * each probe row matches exactly its own salt's replica — so the
    * result is provably identical to the unsalted join and the oracle is
    * the plain SQL join. This is the manual fallback for skew AQE can't
    * split (e.g. a skewed stage feeding a non-splittable operator).
    */
  def skewSalted(spark: SparkSession, dir: String): DataFrame = {
    val S = 8
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    // deterministic stand-in for a skew detector: orders with >= 6 lines
    // (TPC-H caps at 7, so this selects a real, stable subset)
    val hot = li.groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 6).select(col("l_orderkey").as("hk"))
    val liHot = li.join(broadcast(hot), col("l_orderkey") === col("hk"))
      .drop("hk")
      .withColumn("salt", pmod(col("l_linenumber"), lit(S)).cast("int"))
    val liCold = li.join(broadcast(hot), col("l_orderkey") === col("hk"),
      "left_anti")
    val ordHot = ord.join(broadcast(hot), col("o_orderkey") === col("hk"))
      .drop("hk")
      .withColumn("salt", explode(array((0 until S).map(lit): _*)))
    val ordCold = ord.join(broadcast(hot), col("o_orderkey") === col("hk"),
      "left_anti")
    val hotJoin = liHot.join(ordHot,
        liHot("l_orderkey") === ordHot("o_orderkey")
          && liHot("salt") === ordHot("salt"))
      .select(col("o_orderpriority"), col("l_extendedprice"))
    val coldJoin = liCold.join(ordCold,
        liCold("l_orderkey") === ordCold("o_orderkey"))
      .select(col("o_orderpriority"), col("l_extendedprice"))
    hotJoin.unionByName(coldJoin)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        Det.moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Correlated LATERAL subquery — top-1 order per customer through the
    * SQL-surface form. Catalyst DECORRELATES this (DecorrelateInnerQuery
    * + RewriteCorrelatedScalarSubquery family) into a window/join plan —
    * no per-row re-execution of the inner query, which is what makes the
    * lateral form usable at all on a distributed engine. The same
    * statement runs verbatim on DuckDB as the oracle.
    */
  def lateralTop1(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("customer_v")
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      "SELECT c_custkey, c_mktsegment, o.o_orderkey, o.o_totalprice " +
        "FROM customer_v, LATERAL (" +
        "SELECT o_orderkey, o_totalprice FROM orders_v " +
        "WHERE o_custkey = c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o " +
        "ORDER BY c_custkey")
  }

  /** Large-large RANGE self-join via time-bucket BANDING — the scale
    * path when neither side fits a broadcast (join_interval's approach)
    * and a raw theta-join would be quadratic: bucket event time into
    * 30-min bands, replicate ONE side into {band, band+1}, equi-join on
    * (user_id, band), then apply the exact |Δt| ≤ W residual. Pairs are
    * oriented by (time, id), so a qualifying pair matches in EXACTLY one
    * band copy — no post-join distinct. The shuffle is a plain hash
    * exchange on narrow keys; candidate volume is bounded by band
    * population, not table size. 2× replication of one side is the
    * entire overhead.
    */
  def rangeBanded(spark: SparkSession, dir: String): DataFrame = {
    val W = 30L * 60L * 1000000L // 30 minutes in microseconds
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"))
    val a = e.select(col("event_id").as("id_first"), col("user_id"),
        col("t").as("t_a"),
        explode(array(expr(s"CAST(t DIV $W AS BIGINT)"),
          expr(s"CAST(t DIV $W AS BIGINT) + 1"))).as("band"))
    val b = e.select(col("event_id").as("id_second"), col("user_id"),
      col("t").as("t_b"), expr(s"CAST(t DIV $W AS BIGINT)").as("band"))
    a.join(b, Seq("user_id", "band"))
      .filter((col("t_a") < col("t_b")
          || (col("t_a") === col("t_b") && col("id_first") < col("id_second")))
        && col("t_b") - col("t_a") <= W)
      .select(col("user_id"), col("id_first"), col("id_second"),
        (col("t_b") - col("t_a")).as("gap_us"))
      .orderBy("user_id", "id_first", "id_second")
  }

  /** Runtime bloom-filter pruned join (Spark's `InjectRuntimeFilter`):
    * a bloom filter is built AT RUNTIME from the selectively-filtered
    * orders side and pushed into the lineitem scan as a
    * `BloomFilterMightContain` predicate, so most probe-side rows die at
    * the scan instead of flowing through the exchange — at 100 TB that is
    * the difference between shuffling the full fact table and shuffling
    * the ~1/5 that can possibly match. Injection is threshold-gated
    * (`…runtime.bloomFilter.applicationSideScanSizeThreshold`, 10 GB
    * default) and requires a creation side too big to broadcast (a
    * broadcast build already prunes inline) — both true on real
    * clusters, neither at fixture scale, so Round3cSpec forces the
    * thresholds, asserts the injected `might_contain` probe in the
    * physical plan, and checks bloom/no-bloom result equality. The
    * filter is semantically transparent, which is exactly what the
    * oracle verifies.
    */
  def bloomRuntime(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    l.hint("shuffle_hash")
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Dynamic partition pruning (DPP): the fact side is laid out
    * Hive-partitioned on the join key; the dim side's selective filter is
    * evaluated FIRST (reusing the broadcast exchange), and the surviving
    * key set becomes a runtime partition filter on the fact scan —
    * `dynamicpruningexpression(event_type IN dynamicpruning#N)` under
    * PartitionFilters (asserted in Round3cSpec). At 100 TB this skips
    * whole partition directories at planning-of-scan time: the
    * partition-layout complement to [[bloomRuntime]]'s row-level pruning.
    * Both sides must be FILE-based relations (the category dim is staged
    * as parquet too — a broadcastable in-memory LocalRelation gets
    * constant-folded instead of planned as a DPP subquery), which is the
    * real star-schema shape DPP was built for.
    */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // stage only the columns the query reads — a partitioned layout never
    // needs the unused wide columns; staged once per (key, sf) via memoDir
    val tmp = graft.Staging.memoDir("graft_dpp", dir) { tmp =>
      Tables(spark, dir, "events")
        .select("event_type", "value")
        .repartition(col("event_type"))
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(tmp + "/fact")
      Seq(
        ("signup", "acquisition"), ("purchase", "revenue"),
        ("click", "engagement"), ("view", "engagement"),
        ("error", "ops")).toDF("event_type", "category")
        .write.mode("overwrite").parquet(tmp + "/dim")
    }
    val dim = spark.read.parquet(tmp + "/dim")
    spark.read.parquet(tmp + "/fact")
      .join(broadcast(dim.filter(col("category") === "engagement")),
        Seq("event_type"))
      .groupBy("event_type", "category")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / lit(100.0))
          .as("sum_value"))
      .orderBy("event_type")
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of vanishing — the semantics every
    * change-data-capture or snapshot-reconcile join needs on nullable
    * natural keys. Catalyst treats EqualNullSafe as a hash-join key
    * (coalescing it into the shuffle key), so the plan is the same
    * single-exchange SortMergeJoin/HashJoin as plain equality — NOT a
    * theta join. Both sides pre-aggregate per key, so the NULL group is
    * one row each side and the join carries |keys| rows.
    */
  def nullSafe(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables(spark, dir, "orders")
      .withColumn("k",
        when(col("o_custkey") % 7 === 0, lit(null))
          .otherwise(col("o_custkey") % 50))
    val a = keyed.groupBy(col("k").as("k_a"))
      .agg(count(lit(1)).as("n_orders"))
    val b = keyed.groupBy(col("k").as("k_b"))
      .agg(Det.moneySum(col("o_totalprice")).as("total_price"))
    a.join(b, a("k_a") <=> b("k_b"))
      .select(a("k_a").as("k"), col("n_orders"), col("total_price"))
      .orderBy("k")
  }

  /** The AQE skew-join shape: 3/4 of lineitem collapses onto one hot
    * key, the other side is a per-key aggregate, and the merge hint
    * keeps the join a shuffle join (a broadcast would hide the skew).
    * Under defaults the hot reduce partition simply runs long and the
    * result is exact — Wave11Spec re-runs this WITH
    * `spark.sql.adaptive.skewJoin` thresholds lowered and asserts the
    * adaptive plan splits the hot partition (`skew=true` markers) while
    * producing identical rows: the automatic complement to
    * [[skewSalted]]'s manual selective salting.
    */
  def skewAqe(spark: SparkSession, dir: String): DataFrame = {
    def k(c: org.apache.spark.sql.Column) =
      when(c % 4 =!= 0, lit(0L)).otherwise(c)
    // repartition(8) before keying: AQE splits a skewed reduce partition
    // at MAP-output granularity, and the toy fixture is one parquet row
    // group = one mapper = one unsplittable block. Eight round-robin
    // mappers restore the many-mapper layout a real cluster always has
    // (where this repartition would be a no-op to remove).
    val facts = Tables(spark, dir, "lineitem")
      .repartition(8)
      .select(k(col("l_orderkey")).as("k"), col("l_quantity"),
        col("l_extendedprice"))
    // materialize the per-key dim: OptimizeSkewedJoin only rewrites a
    // join whose children are plain shuffle stages — an aggregate
    // between the exchange and the join disqualifies the pattern, so the
    // dim is computed first and re-enters the join as a leaf
    val dim = Tables(spark, dir, "orders")
      .select(k(col("o_orderkey")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_orders"))
      .localCheckpoint()
    facts.join(dim.hint("merge"), Seq("k"))
      .groupBy("k", "n_orders")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"),
        graft.Det.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("k")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_aqe" -> skewAqe,
    "join_nullsafe" -> nullSafe,
    "join_dpp" -> dppJoin,
    "join_bloom_runtime" -> bloomRuntime,
    "join_range_banded" -> rangeBanded,
    "join_lateral" -> lateralTop1,
    "join_skew_salted" -> skewSalted,
    "join_bucketed" -> bucketed,
    "join_inner_equi" -> innerEqui,
    "join_broadcast" -> broadcastDims,
    "join_left_outer" -> leftOuter,
    "join_right_outer" -> rightOuter,
    "join_full_outer" -> fullOuter,
    "join_semi" -> semi,
    "join_anti" -> anti,
    "join_theta_range" -> thetaRange,
    "join_cross" -> cross,
    "join_asof" -> asof,
    "join_asof_nearest" -> asofNearest,
    "join_interval" -> interval,
    "join_multiway" -> multiway
  )

  def oracle: Map[String, String] = Map(
    "join_skew_aqe" ->
      ("WITH f AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0 " +
        "ELSE l_orderkey END AS k, l_quantity, l_extendedprice FROM lineitem), " +
        "d AS (SELECT CASE WHEN o_orderkey % 4 <> 0 THEN 0 " +
        "ELSE o_orderkey END AS k, count(*) AS n_orders " +
        "FROM orders GROUP BY 1) " +
        "SELECT f.k, d.n_orders, count(*) AS n_lines, " +
        "sum(l_quantity) AS sum_qty, " +
        Det.moneySumSql("l_extendedprice") + " AS sum_price " +
        "FROM f JOIN d ON f.k = d.k GROUP BY f.k, d.n_orders " +
        "ORDER BY f.k"),
    "join_nullsafe" ->
      ("WITH keyed AS (SELECT CASE WHEN o_custkey % 7 = 0 THEN NULL " +
        "ELSE o_custkey % 50 END AS k, o_totalprice FROM orders), " +
        "a AS (SELECT k, count(*) AS n_orders FROM keyed GROUP BY k), " +
        "b AS (SELECT k, " + Det.moneySumSql("o_totalprice") +
        " AS total_price FROM keyed GROUP BY k) " +
        "SELECT a.k, a.n_orders, b.total_price FROM a JOIN b " +
        "ON a.k IS NOT DISTINCT FROM b.k ORDER BY a.k"),
    "join_dpp" ->
      ("SELECT event_type, 'engagement' AS category, count(*) AS n, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 " +
        "AS sum_value " +
        "FROM events WHERE event_type IN ('click', 'view') " +
        "GROUP BY event_type ORDER BY event_type"),
    "join_bloom_runtime" ->
      ("SELECT o_orderstatus, count(*) AS n_items, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderpriority = '1-URGENT' " +
        "GROUP BY 1 ORDER BY 1"),
    "join_range_banded" ->
      ("SELECT a.user_id, a.event_id AS id_first, b.event_id AS id_second, " +
        "epoch_us(b.ts) - epoch_us(a.ts) AS gap_us " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id)) " +
        "AND epoch_us(b.ts) - epoch_us(a.ts) <= 30*60*1000000 " +
        "ORDER BY a.user_id, id_first, id_second"),
    "join_lateral" ->
      ("SELECT c_custkey, c_mktsegment, o.o_orderkey, o.o_totalprice " +
        "FROM customer, LATERAL (" +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o " +
        "ORDER BY c_custkey"),
    "join_skew_salted" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        Det.moneySumSql("l_extendedprice") + " AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),
    "join_bucketed" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "join_inner_equi" ->
      ("SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "ORDER BY o_orderkey"),
    "join_broadcast" ->
      ("SELECT r_name, n_name, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "join_left_outer" ->
      ("SELECT c_custkey, count(o_orderkey) AS n_orders, " +
        "round(coalesce(sum(o_totalprice),0),2) AS total_spent " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey"),
    "join_right_outer" ->
      ("SELECT c_custkey, count(o_orderkey) AS n_orders, " +
        "max(o_orderdate) IS NOT NULL AS has_orders " +
        "FROM orders RIGHT JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey"),
    "join_full_outer" ->
      ("SELECT coalesce(a.o_custkey, b.user_id) AS id, a.n_orders, b.n_events " +
        "FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) a " +
        "FULL OUTER JOIN (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) b " +
        "ON a.o_custkey = b.user_id ORDER BY id"),
    "join_semi" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderstatus = 'F') ORDER BY c_custkey"),
    "join_anti" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderstatus = 'P') ORDER BY c_custkey"),
    "join_theta_range" ->
      ("SELECT p_brand, count(*) AS n_items, round(avg(l_quantity),4) AS avg_qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "join_cross" ->
      ("SELECT r_name, n_name FROM region CROSS JOIN nation " +
        "ORDER BY r_name, n_name"),
    "join_asof" ->
      ("SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, " +
        "(SELECT max(epoch_us(s.ts)) FROM events s " +
        "WHERE s.user_id = e.user_id AND s.event_type = 'signup' " +
        "AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id))) AS signup_ts_us " +
        "FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id"),
    "join_asof_nearest" ->
      ("WITH t AS (SELECT event_id, user_id, ts, event_type, " +
        "CASE WHEN event_type = 'signup' THEN ts END AS sts FROM events), " +
        "w AS (SELECT *, " +
        "last_value(sts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts, " +
        "first_value(sts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts FROM t) " +
        "SELECT event_id, user_id, epoch_us(ts) AS ts_us, " +
        "CASE WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL " +
        "OR epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts)) " +
        "THEN epoch_us(back_ts) ELSE epoch_us(fwd_ts) END AS nearest_us, " +
        "CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL " +
        "WHEN fwd_ts IS NULL OR (back_ts IS NOT NULL " +
        "AND epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts)) " +
        "THEN 'backward' ELSE 'forward' END AS direction " +
        "FROM w WHERE event_type = 'purchase' ORDER BY event_id"),
    "join_interval" ->
      ("WITH anchors AS (SELECT user_id, min(ts) AS anchor_ts FROM events " +
        "WHERE event_type = 'signup' GROUP BY 1) " +
        "SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, " +
        "epoch_us(a.anchor_ts) AS anchor_us " +
        "FROM events e JOIN anchors a ON e.user_id = a.user_id " +
        "WHERE e.ts BETWEEN a.anchor_ts - INTERVAL 30 MINUTE " +
        "AND a.anchor_ts + INTERVAL 30 MINUTE " +
        "ORDER BY e.event_id"),
    "join_multiway" ->
      ("SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' " +
        "GROUP BY o_orderkey, o_orderdate " +
        "ORDER BY revenue DESC, o_orderkey LIMIT 10")
  )
}
