package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.4 — aggregation operators.
  *
  * Scale notes (100 TB): every query is hash aggregation with map-side
  * partial aggregation — one Exchange on the grouping keys. Rollup/cube
  * expand grouping sets BEFORE the shuffle (Catalyst `Expand`), so
  * subtotals are still one pass. `countDistinct` plans the two-phase
  * expand; `approx_count_distinct` (HLL) is the constant-memory
  * alternative at scale. Determinism: Det.moneySum for sums of products,
  * round(·,2/4) for stored-column sums/avgs (see Det scaladoc).
  */
object Aggregates {

  /** TPC-H Q1 pricing-summary shape — the flagship query.
    * scan → filter (pushed to parquet) → project → partial agg → exchange
    * → final agg → sort. 6 output rows at every sf.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  def globalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        Det.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))

  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("day", "event_type")

  /** HLL++ sketch vs exact — no oracle (approximate); bounds checked in
    * AggregateSpec. At 100 TB the sketch is mergeable constant-memory
    * state; the exact column exists only to measure the error.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", 0.02).as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .orderBy("event_type")

  /** ROLLUP over the star join. Sorting a `rollup().agg()` result by its
    * grouping columns trips Spark's ambiguous-attribute check when the
    * child is a join, so the rollup itself is expressed in SQL over a
    * temp view of the (DataFrame-built, broadcast) join.
    */
  def rollup(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    l.join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("l_extendedprice"), col("l_discount"))
      .createOrReplaceTempView("rollup_src")
    spark.sql(
      """SELECT region, nation,
        |  CAST(sum(CAST(round((l_extendedprice*(1-l_discount))*1e6, 0) AS BIGINT)) AS DOUBLE)/1e6 AS revenue,
        |  count(*) AS n_items
        |FROM rollup_src
        |GROUP BY ROLLUP (region, nation)
        |ORDER BY region NULLS FIRST, nation NULLS FIRST
        |""".stripMargin)
  }

  def cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        |""".stripMargin)
  }

  /** NOAA-shaped long→wide pivot: daily per-type averages as columns
    * (stands in for the TMAX/TMIN/PRCP pivot). Explicit value list for
    * determinism.
    */
  def pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", Seq("signup", "click", "error", "view", "purchase"))
      .agg(round(sum("value") * 100, 0).cast("long").cast("double")
        / (count(lit(1)) * 100).cast("double"))
      .select(col("day"), col("signup").as("avg_signup"),
        col("click").as("avg_click"), col("error").as("avg_error"),
        col("view").as("avg_view"), col("purchase").as("avg_purchase"))
      .orderBy("day")

  /** Wide→long inverse ETL step. */
  def unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "element", "value")
      .orderBy("l_orderkey", "l_linenumber", "element")

  /** Per-group value lists. The list is emitted as a comma-joined string:
    * the driver's generic comparator sorts every output column, and
    * array-typed columns are unsortable there (round-1 gate error) —
    * serializing keeps the full list content hash-checkable.
    */
  def collectLists(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(concat_ws(",",
        transform(array_sort(collect_list("o_orderkey")), _.cast("string")))
        .as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** Two-phase salted aggregation — the skew-mitigation pattern for
    * 100 TB hot keys, demonstrated end-to-end: explode each row into a
    * (key, salt) group first (here 8 salts via a deterministic hash of
    * the order key), partially aggregate per (key, salt), then finish
    * per key. Result is identical to the direct groupBy (the oracle
    * states the direct form); what changes is that no single reducer
    * ever sees a whole hot key.
    */
  def saltedSkew(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(8)))
      .groupBy("l_returnflag", "salt")
      .agg(count(lit(1)).as("pn"), sum("l_quantity").as("pq"))
      .groupBy("l_returnflag")
      .agg(sum("pn").as("n_items"), round(sum("pq"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  /** Scalar + correlated subqueries through Spark SQL — exercises
    * Catalyst's subquery rewrite rules (RewriteCorrelatedScalarSubquery,
    * RewritePredicateSubquery → semi-join).
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("customer_sq")
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_sq")
    spark.sql(
      """SELECT c_custkey, c_acctbal
        |FROM customer_sq
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq)
        |  AND EXISTS (SELECT 1 FROM orders_sq WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey
        |""".stripMargin)
  }

  def stats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_extendedprice"), 4).as("sd_price"),
        round(var_samp("l_extendedprice"), 0).as("var_price"),
        round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
        expr("round(percentile(l_extendedprice, 0.5), 4)").as("median_price"),
        round(avg("l_extendedprice"), 4).as("avg_price"))
      .orderBy("l_returnflag")

  /** Exact median + deterministic mode per market segment. The median is
    * the interpolated percentile(0.5) — both engines interpolate the even
    * midpoint from identical doubles, so the raw value is bit-identical.
    * `mode()` is tie-nondeterministic in both engines, so the mode is
    * computed as a count + row_number argmax with an explicit value
    * tiebreak.
    */
  def medianMode(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val med = o.join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(expr("round(percentile(o_totalprice, 0.5), 4)").as("median_price"),
        count(lit(1)).as("n_orders"))
    val wMode = Window.partitionBy("c_mktsegment")
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    val mode = o.join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wMode))
      .filter(col("rk") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
        col("cnt").as("mode_count"))
    med.join(mode, Seq("c_mktsegment"))
      .select("c_mktsegment", "median_price", "n_orders",
        "mode_priority", "mode_count")
      .orderBy("c_mktsegment")
  }

  /** Mergeable HLL sketches — the 100 TB distinct-count pattern: one
    * sketch per (day) partition, merged with hll_union_agg instead of
    * re-scanning raw data. No oracle (sketch estimates are
    * implementation-specific); the unit test bounds the estimate against
    * the exact count.
    */
  def sketchMerge(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct("user_id").as("exact_day"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_total"),
        sum("exact_day").as("sum_daily_exact"),
        count(lit(1)).as("n_days"))

  /** Exact quartiles per group via `percentile_cont` WITHIN GROUP.
    * Inputs are snapped to integer cents first: with integer data points
    * and quantile fractions in {0.25, 0.5, 0.75} the interpolation
    * `a + f·(b-a)` is EXACT in double arithmetic (f is a power-of-two
    * multiple), so Spark and DuckDB (`quantile_cont`) agree bit-for-bit
    * regardless of how each engine associates the expression — the same
    * trick as Det.moneySum, applied to order statistics. One hash
    * aggregate, no window: percentile_cont sorts within each group's
    * state, never globally.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY cents)").as("c25"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)").as("c50"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY cents)").as("c75"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        (col("c25") / 100).as("p25"),
        (col("c50") / 100).as("p50"),
        (col("c75") / 100).as("p75"),
        col("n"))
      .orderBy("o_orderpriority")

  /** Correlation + least-squares regression per group, computed the
    * 100-TB way: the five raw moments (Σx, Σy, Σxy, Σx², Σy²) are EXACT
    * integer sums of cent/unit-scaled inputs (decimal(38,0) in Spark,
    * HUGEINT in DuckDB — both exact, both order-independent), and the
    * closed-form corr/slope/intercept is one identical double expression
    * over those exact components. Builtin corr()/regr_slope() stream
    * float state whose partition-order-dependent rounding can't
    * hash-match across engines; moment sums CAN, with one aggregation
    * pass either way.
    */
  def corrRegression(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(38,0)") // integer-valued units
    val y = round(col("l_extendedprice") * 100, 0).cast("decimal(38,0)")
    val m = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val slope = cov / vx
    m.select(col("l_returnflag"),
        col("n").cast("long").as("n_rows"),
        (cov / (sqrt(vx) * sqrt(vy))).as("corr_qty_price"),
        (slope / 100).as("slope_price_per_qty"),
        ((col("sy") - slope * col("sx")) / (col("n") * 100))
          .as("intercept_price"))
      .orderBy("l_returnflag")
  }

  /** EXACT distinct counting via bitmap aggregation — the mergeable
    * exact-distinct pattern: each (day, bucket) builds a fixed-size
    * bitmap of user-id bit positions (`bitmap_construct_agg`), bitmaps
    * OR-merge in partial aggregation, and the final count is a sum of
    * `bitmap_count`s. Unlike countDistinct's two-phase expand, the
    * shuffled state is one bitmap per bucket regardless of row count;
    * unlike HLL it is exact — so the oracle is plain count(DISTINCT).
    */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .groupBy(col("day"), expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy("day")
      .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
      .orderBy("day")

  /** GROUPING SETS with grouping metadata: `grouping(col)` flags tell
    * subtotal rows apart from genuine NULL group keys — the contract
    * BI layers rely on. Same single-pass Expand shuffle as rollup/cube.
    */
  def groupingId(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_gid")
    spark.sql(
      "SELECT o_orderpriority, o_orderstatus, " +
        "grouping(o_orderpriority) AS g_pri, " +
        "grouping(o_orderstatus) AS g_st, " +
        "count(*) AS n, " +
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents " +
        "FROM orders_gid " +
        "GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), " +
        "(o_orderpriority), (o_orderstatus), ()) " +
        "ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus")
  }

  /** FILTER-clause / conditional aggregates + deterministic arg-extrema.
    * Each `FILTER (WHERE …)` aggregate is one conditional accumulator
    * inside the SAME partial+final HashAggregate — no expand, no
    * per-predicate self-join the way naive subquery rewrites would
    * (at 100 TB that is one pass over the fact table for any number of
    * conditions). `max_by`/`min_by` are keyed on the UNIQUE o_orderkey so
    * the arg-extremum is deterministic — arg-extrema on non-unique keys
    * are scheduling-dependent and would break the §5.3 hash gate. The
    * filtered money sum goes through the integer-cent grid ([[Det]]) so
    * partial-merge order cannot change the answer.
    */
  def filteredAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_finished"),
        expr("count_if(o_totalprice > 150000)").as("n_big"),
        (expr("sum(CAST(round(o_totalprice * 100, 0) AS LONG)) " +
          "FILTER (WHERE o_orderstatus = 'F')") / lit(100.0))
          .as("sum_finished_price"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_totalprice > 400000)").as("any_jumbo"),
        expr("max_by(o_totalprice, o_orderkey)").as("price_of_max_key"),
        expr("min_by(o_totalprice, o_orderkey)").as("price_of_min_key"))
      .orderBy("o_orderpriority")

  /** Quantile sketch: `approx_percentile` (Greenwald-Khanna) — the
    * constant-memory, MERGEABLE quantile path for 100 TB where exact
    * percentile_cont's full sort/expand is off the table. Like the HLL
    * and bitmap keys this is two-phase (per-partition sketches merged
    * reduce-side). No oracle (sketch output is merge-order-sensitive in
    * general); Round3cSpec bounds it against the exact quartiles.
    */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), " +
          "10000)").as("q"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        element_at(col("q"), 1).as("p25"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p75"),
        col("n"))
      .orderBy("l_returnflag")

  /** Explicit materialization + multi-consumer reuse: an aggregated base
    * is persist()ed and consumed by TWO branches (top-5 / bottom-5
    * suppliers); the second branch reads the InMemoryRelation instead of
    * re-running the scan+aggregate chain (InMemoryTableScan asserted in
    * Round3cSpec). Spark does NOT share common subplans across branches
    * of one query (measured on llm_text_tfidf, where an unshared explode
    * ran twice) — persist/checkpoint is the user-controlled fix, and at
    * 100 TB it is the difference between one pass and N over a fan-out
    * DataFrame. Ordered limits carry a unique suppkey tiebreak (§5.3).
    * Cache lifetime: the pinned base is one tiny row-per-suppkey
    * aggregate; repeat builds hit the CacheManager's same-plan dedup
    * (no accumulation per call), so a multi-SF run pins at most one
    * such relation per SF dir — bounded by design, and unpersisting
    * before the caller's action would defeat the operator's purpose.
    */
  def cacheReuse(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"),
        Det.moneySum(col("l_extendedprice")).as("revenue"))
      .persist()
    val top = base.orderBy(col("n_items").desc, col("l_suppkey"))
      .limit(5).withColumn("which", lit("top"))
    val bottom = base.orderBy(col("n_items").asc, col("l_suppkey"))
      .limit(5).withColumn("which", lit("bottom"))
    top.unionByName(bottom)
      .select("which", "l_suppkey", "n_items", "revenue")
      .orderBy("which", "l_suppkey")
  }

  /** Exchange REUSE without caching: the per-customer order-count
    * aggregate appears twice in the plan (each customer joined to its
    * predecessor's count), and Catalyst's ReuseExchange rule collapses
    * the two identical aggregate subtrees into ONE shuffle + a
    * ReusedExchange node — the zero-storage sibling of
    * [[cacheReuse]]'s persist(): no memory pinned, the map stage just
    * runs once (plan-asserted in Wave13Spec). At 100 TB this is what
    * makes self-join-on-derived-table queries pay one corpus pass.
    */
  def exchangeReuse(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables(spark, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    cnt.as("a")
      .join(cnt.as("b"), col("a.o_custkey") === col("b.o_custkey") + 1)
      .select(col("a.o_custkey").as("o_custkey"), col("a.n").as("n"),
        col("b.n").as("prev_n"))
      .orderBy("o_custkey")
  }

  /** Count-min-sketch heavy hitters: ONE mergeable sketch over the word
    * stream (map-side partial sketches merge associatively — the
    * 100 TB frequency-estimation pattern where an exact count table
    * would be vocabulary-sized), probed for the exact top-10 words so
    * the CMS overestimate-only guarantee is checkable row by row
    * (property-tested in Wave13Spec; no oracle — the sketch binary is
    * Spark-specific). The probe is a scalar UDF by necessity: Spark
    * ships no sketch-probe expression; it runs over exactly 10 rows
    * with the one-row sketch frame broadcast.
    */
  def cmsHeavy(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val sketch = words.agg(expr(
      "count_min_sketch(w, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)")
      .as("sk"))
    val probe = udf((sk: Array[Byte], w: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(sk)).estimateCount(w))
    words.groupBy("w").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("w")).limit(10)
      .crossJoin(broadcast(sketch))
      .select(col("w").as("word"), col("exact"),
        probe(col("sk"), col("w")).as("cms_estimate"))
      .orderBy(col("exact").desc, col("word"))
  }

  /** Equi-width histogram via `width_bucket`: one pass, one shuffle on
    * the bucket id — the distribution profile an optimizer or data-quality
    * monitor wants. Bucket boundaries are CLOSED-FORM from the literal
    * range, so the histogram is reproducible anywhere (an equi-HEIGHT
    * histogram would need the percentile machinery of agg_percentile).
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .withColumn("bucket",
        expr("width_bucket(o_totalprice, 0, 600000, 10)").cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        Det.moneySum(col("o_totalprice")).as("total_price"))
      .orderBy("bucket")

  /** Ordered string aggregation via Spark 4's `listagg(x, sep) WITHIN
    * GROUP (ORDER BY ...)` — the SQL-standard surface (DuckDB spells it
    * `string_agg(... ORDER BY ...)`). The WITHIN GROUP ordering makes the
    * concatenation deterministic under any partitioning; without it the
    * result depends on task schedule. At scale the concat state grows
    * with group size — keep it for bounded groups (names per segment
    * here), use collect_list+sort for anything that needs post-processing.
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      "SELECT c_mktsegment, count(*) AS n_customers, " +
        "listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names " +
        "FROM customer_v WHERE c_custkey <= 200 " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")
  }

  /** `Observation` metrics: audit aggregates collected DURING the main
    * action (one pass — no second scan for the audit job), here against
    * a no-op sink. The pipeline-instrumentation surface: at 100 TB the
    * row count/total you log must come from the same pass that wrote
    * the data, or it can silently disagree. Metrics re-emitted as the
    * result frame; the oracle states the same aggregates — proving the
    * observed values equal a real aggregation.
    */
  def observeMetrics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val obs = Observation()
    Tables(spark, dir, "lineitem")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"),
        max("l_orderkey").as("max_key"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
      m("cents").asInstanceOf[Long] / 100.0,
      m("max_key").asInstanceOf[Long]))
      .toDF("n_rows", "total_price", "max_key")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "plan_observe" -> observeMetrics,
    "agg_string_agg" -> stringAgg,
    "agg_histogram" -> histogram,
    "plan_cache_reuse" -> cacheReuse,
    "plan_exchange_reuse" -> exchangeReuse,
    "agg_cms_heavy" -> cmsHeavy,
    "agg_approx_percentile" -> approxPercentile,
    "agg_filtered" -> filteredAgg,
    "agg_grouping_id" -> groupingId,
    "agg_bitmap_distinct" -> bitmapDistinct,
    "agg_corr_regression" -> corrRegression,
    "agg_percentile" -> percentiles,
    "agg_median_mode" -> medianMode,
    "agg_sketch_merge" -> sketchMerge,
    "agg_hash_group" -> pricingSummary,
    "agg_global" -> globalAgg,
    "agg_distinct" -> distinctAgg,
    "agg_approx_distinct" -> approxDistinct,
    "agg_rollup" -> rollup,
    "agg_cube" -> cube,
    "agg_grouping_sets" -> groupingSets,
    "agg_minmax_pivot" -> pivot,
    "agg_unpivot" -> unpivot,
    "agg_collect" -> collectLists,
    "agg_stats" -> stats,
    "agg_salted_skew" -> saltedSkew,
    "filter_scalar_subquery" -> scalarSubquery
  )

  def oracle: Map[String, String] = Map(
    "plan_observe" ->
      ("SELECT count(*) AS n_rows, " +
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) " +
        "/ 100.0 AS total_price, " +
        "max(l_orderkey) AS max_key FROM lineitem"),
    "agg_string_agg" ->
      ("SELECT c_mktsegment, count(*) AS n_customers, " +
        "string_agg(c_name, ',' ORDER BY c_name) AS names " +
        "FROM customer WHERE c_custkey <= 200 " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    // DuckDB 1.0 has no width_bucket — state the same closed form:
    // bucket width is exactly 60000, so floor(x/60000)+1 (clamped) is
    // the identical IEEE computation on both engines
    "agg_histogram" ->
      ("SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0 " +
        "WHEN o_totalprice >= 600000 THEN 11 " +
        "ELSE floor(o_totalprice / 60000) + 1 END AS BIGINT) " +
        "AS bucket, count(*) AS n_orders, " +
        Det.moneySumSql("o_totalprice") + " AS total_price " +
        "FROM orders GROUP BY 1 ORDER BY 1"),
    "plan_exchange_reuse" ->
      ("WITH cnt AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) " +
        "SELECT a.o_custkey, a.n, b.n AS prev_n " +
        "FROM cnt a JOIN cnt b ON a.o_custkey = b.o_custkey + 1 " +
        "ORDER BY a.o_custkey"),
    "plan_cache_reuse" ->
      ("WITH b AS (SELECT l_suppkey, count(*) AS n_items, " +
        Det.moneySumSql("l_extendedprice") + " AS revenue " +
        "FROM lineitem GROUP BY 1), " +
        "t AS (SELECT 'top' AS which, l_suppkey, n_items, revenue " +
        "FROM b ORDER BY n_items DESC, l_suppkey LIMIT 5), " +
        "bo AS (SELECT 'bottom' AS which, l_suppkey, n_items, revenue " +
        "FROM b ORDER BY n_items ASC, l_suppkey LIMIT 5) " +
        "SELECT * FROM t UNION ALL SELECT * FROM bo " +
        "ORDER BY which, l_suppkey"),
    "agg_filtered" ->
      ("SELECT o_orderpriority, count(*) AS n_orders, " +
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished, " +
        "count(*) FILTER (WHERE o_totalprice > 150000) AS n_big, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) " +
        "FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 100 " +
        "AS sum_finished_price, " +
        "bool_and(o_totalprice > 0) AS all_positive, " +
        "bool_or(o_totalprice > 400000) AS any_jumbo, " +
        "max_by(o_totalprice, o_orderkey) AS price_of_max_key, " +
        "min_by(o_totalprice, o_orderkey) AS price_of_min_key " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "agg_grouping_id" ->
      ("SELECT o_orderpriority, o_orderstatus, " +
        "CAST(grouping(o_orderpriority) AS TINYINT) AS g_pri, " +
        "CAST(grouping(o_orderstatus) AS TINYINT) AS g_st, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
        "AS total_cents " +
        "FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), " +
        "(o_orderpriority), (o_orderstatus), ()) " +
        "ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus"),
    "agg_bitmap_distinct" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, " +
        "count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "agg_corr_regression" ->
      ("WITH m AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows, " +
        "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price, " +
        "((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 100 AS slope_price_per_qty, " +
        "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / (n * 100) AS intercept_price " +
        "FROM m ORDER BY l_returnflag"),
    "agg_percentile" ->
      ("WITH c AS (SELECT o_orderpriority, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
        "SELECT o_orderpriority, " +
        "quantile_cont(cents, 0.25) / 100 AS p25, " +
        "quantile_cont(cents, 0.5) / 100 AS p50, " +
        "quantile_cont(cents, 0.75) / 100 AS p75, " +
        "count(*) AS n FROM c GROUP BY 1 ORDER BY 1"),
    "agg_median_mode" ->
      ("WITH j AS (SELECT c_mktsegment, o_totalprice, o_orderpriority " +
        "FROM orders JOIN customer ON o_custkey = c_custkey), " +
        "med AS (SELECT c_mktsegment, round(median(o_totalprice), 4) AS " +
        "median_price, count(*) AS n_orders FROM j GROUP BY 1), " +
        "m AS (SELECT c_mktsegment, o_orderpriority AS mode_priority, " +
        "cnt AS mode_count FROM (SELECT c_mktsegment, o_orderpriority, " +
        "count(*) AS cnt, row_number() OVER (PARTITION BY c_mktsegment " +
        "ORDER BY count(*) DESC, o_orderpriority) AS rk FROM j " +
        "GROUP BY 1, 2) WHERE rk = 1) " +
        "SELECT c_mktsegment, median_price, n_orders, mode_priority, " +
        "mode_count FROM med JOIN m USING (c_mktsegment) " +
        "ORDER BY c_mktsegment"),
    "agg_hash_group" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity),2) AS sum_qty, " +
        "round(sum(l_extendedprice),2) AS sum_base_price, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS sum_disc_price, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)*(1+l_tax)") + " AS sum_charge, " +
        "round(avg(l_quantity),4) AS avg_qty, " +
        "round(avg(l_extendedprice),4) AS avg_price, " +
        "round(avg(l_discount),4) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "agg_global" ->
      ("SELECT count(*) AS n_rows, round(sum(l_quantity),2) AS sum_qty, " +
        "min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS revenue " +
        "FROM lineitem"),
    "agg_distinct" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, " +
        "count(DISTINCT user_id) AS n_users, count(*) AS n_events " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "agg_rollup" ->
      ("SELECT r_name AS region, n_name AS nation, " +
        Det.moneySumSql("l_extendedprice*(1-l_discount)") + " AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"),
    "agg_cube" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, " +
        "count(*) AS n_items FROM lineitem " +
        "GROUP BY CUBE (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "agg_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(grouping(l_returnflag) AS BIGINT) AS g_flag, " +
        "CAST(grouping(l_linestatus) AS BIGINT) AS g_status, " +
        "round(sum(l_quantity),2) AS sum_qty, count(*) AS n_items " +
        "FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) " +
        "ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "agg_minmax_pivot" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, " +
        Seq("signup", "click", "error", "view", "purchase").map { t =>
          s"CAST(CAST(round(sum(CASE WHEN event_type='$t' THEN value END)*100) " +
            s"AS BIGINT) AS DOUBLE)/(count(CASE WHEN event_type='$t' THEN value END)*100.0) " +
            s"AS avg_$t"
        }.mkString(", ") +
        " FROM events GROUP BY 1 ORDER BY 1"),
    "agg_unpivot" ->
      ("SELECT l_orderkey, l_linenumber, 'l_quantity' AS element, l_quantity AS value FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, element"),
    "agg_collect" ->
      ("SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys, " +
        "count(*) AS n_orders FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
    "agg_salted_skew" ->
      ("SELECT l_returnflag, count(*) AS n_items, " +
        "round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "filter_scalar_subquery" ->
      ("SELECT c_custkey, c_acctbal FROM customer " +
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) " +
        "AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "ORDER BY c_custkey"),
    "agg_stats" ->
      ("SELECT l_returnflag, " +
        "round(stddev_samp(l_extendedprice),4) AS sd_price, " +
        "round(var_samp(l_extendedprice),0) AS var_price, " +
        "round(corr(l_quantity, l_extendedprice),4) AS corr_qty_price, " +
        "round(quantile_cont(l_extendedprice, 0.5),4) AS median_price, " +
        "round(avg(l_extendedprice),4) AS avg_price " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
  )
}
