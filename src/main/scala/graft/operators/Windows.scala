package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.5 — window functions.
  *
  * Scale notes (100 TB): each query is one window Exchange on the
  * partition key (customer/user/order) — no driver-side state. Rank
  * filters (`rn <= 3`) run before the final sort so the big partition
  * stays distributed. Window ORDER BY always carries a unique tiebreak
  * column so results are deterministic under any partition order; ntile
  * (whose tie assignment is order-dependent) gets a fully unique ordering.
  */
object Windows {

  def rankTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  def rankVariants(spark: SparkSession, dir: String): DataFrame = {
    val tied = Window.partitionBy("l_orderkey").orderBy("l_quantity")
    val unique = Window.partitionBy("l_orderkey")
      .orderBy("l_quantity", "l_linenumber")
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        rank().over(tied).cast("long").as("rnk"),
        dense_rank().over(tied).cast("long").as("drnk"),
        percent_rank().over(tied).as("pct_rnk"),
        ntile(4).over(unique).cast("long").as("tile"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  def analytic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
        (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
          .as("gap_us"))
      .orderBy("event_id")
  }

  def frameRows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, Window.currentRow)
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 4).as("rolling3_sum"),
        count(lit(1)).over(w).as("rolling3_n"))
      .orderBy("event_id")
  }

  /** 7-day moving average per event_type — range frame over event time
    * (the NOAA "daily rolling climate stat" shape). The average is
    * computed exactly: frame sum snapped to integer cents (values are
    * 2-decimal), one division — round(avg, k) would land on decimal
    * midpoints whenever the frame count is a power of 2·5 (measured:
    * 521.65/8 → 65.20625).
    */
  def frameRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts_us"))
      .rangeBetween(-7L * 86400L * 1000000L, Window.currentRow)
    val cents = round(sum("value").over(w) * 100, 0).cast("long")
    val n = count(lit(1)).over(w)
    Tables(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("event_type"), col("ts_us"),
        (cents.cast("double") / (n * 100).cast("double")).as("mov_avg"))
      .orderBy("event_id")
  }

  def running(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_total"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("o_custkey", "running_n")
  }

  def firstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "events")
      .withColumn("v_nonerr",
        when(col("event_type") =!= "error", col("value")))
      .select(col("event_id"), col("user_id"),
        first("v_nonerr", ignoreNulls = true).over(w).as("first_ok_value"),
        last("v_nonerr", ignoreNulls = true).over(w).as("last_ok_value"))
      .orderBy("event_id")
  }

  /** cume_dist / percent_rank over a unique ordering — both are exact
    * rational divisions, bit-identical across engines.
    */
  def cumeDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_totalprice", "o_orderkey")
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        cume_dist().over(w).as("cd"),
        percent_rank().over(w).as("pr"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** nth_value over both a running frame (value appears only once the
    * frame has reached row n) and the full partition frame.
    */
  def nthValue(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_totalprice"), 2).over(run).as("second_so_far"),
        nth_value(col("o_totalprice"), 3).over(full).as("third_overall"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** IGNORE NULLS navigation — gap-filling over a sparse column (the
    * last-observation-carried-forward shape): previous and running-last
    * non-null event_type, with 'error' rows nulled out. Same single
    * (user_id; ts, event_id) window exchange as the other analytics.
    */
  def ignoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("et", expr("nullif(event_type, 'error')"))
      .select(col("event_id"), col("user_id"), col("et"),
        lag(col("et"), 1, null, ignoreNulls = true).over(w)
          .as("prev_nonnull"),
        last(col("et"), ignoreNulls = true).over(wRun).as("locf"))
      .orderBy("event_id")
  }

  /** Rolling median over a 5-row frame per user. Spark's `median()`
    * REJECTS window frames (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC —
    * measured), so the engine composes it: `collect_list` over the ROWS
    * frame, `sort_array`, exact middle selection — on integer cents, so
    * the even-count midpoint (a+b)/2 is a dyadic rational and the result
    * is bit-identical to DuckDB's native frame median. The frame holds
    * ≤5 elements, so per-row cost is O(k log k) on a constant k — the
    * robust-smoothing window for noisy metrics where a rolling MEAN
    * chases outliers.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-4, Window.currentRow)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .withColumn("arr", sort_array(collect_list("cents").over(w)))
      .withColumn("n", size(col("arr")))
      .select(col("user_id"), col("event_id"),
        (when(col("n") % 2 === 1,
          element_at(col("arr"), expr("CAST((n + 1) div 2 AS INT)"))
            .cast("double"))
          .otherwise((element_at(col("arr"), expr("CAST(n div 2 AS INT)"))
            + element_at(col("arr"), expr("CAST(n div 2 + 1 AS INT)")))
            / lit(2.0))
          / lit(100.0)).as("rolling_median"),
        col("n").cast("long").as("frame_size"))
      .orderBy("event_id")
  }

  /** Running DISTINCT count per partition — Spark REJECTS
    * `count(DISTINCT …) OVER` outright, so the engine composes it as
    * `size(collect_set(…))` over the running frame: the set state is the
    * same bounded structure a native distinct-window would keep (≤
    * #distinct values per group — here ≤5 event types), and the count is
    * exact, not a sketch. The "how many distinct items has this user
    * touched so far" cumulative-cardinality shape.
    */
  def distinctRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        size(collect_set("event_type").over(w)).cast("long")
          .as("distinct_types_so_far"))
      .orderBy("event_id")
  }

  /** Time-based RANGE frame (`RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
    * AND CURRENT ROW` over the event timestamp): the per-entity rolling
    * 1-hour activity window — unlike [[frameRows]]' physical row frames,
    * the frame width here is wall-clock, so bursts widen the frame and
    * quiet periods shrink it. One user-keyed exchange; the frame scan is
    * the standard sliding two-pointer inside each partition. The sum
    * accumulates integer cents, so frame totals are order-exact.
    */
  def frameTime(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        expr("count(*) OVER (PARTITION BY user_id ORDER BY ts " +
          "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")
          .as("n_1h"),
        (expr("sum(cents) OVER (PARTITION BY user_id ORDER BY ts " +
          "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")
          / 100.0).as("sum_1h"))
      .orderBy("user_id", "ts_us", "event_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_frame_time" -> frameTime,
    "win_distinct_running" -> distinctRunning,
    "win_rolling_median" -> rollingMedian,
    "win_ignore_nulls" -> ignoreNulls,
    "win_nth_value" -> nthValue,
    "win_cume_dist" -> cumeDist,
    "win_rank_topn" -> rankTopN,
    "win_rank_variants" -> rankVariants,
    "win_analytic" -> analytic,
    "win_frame_rows" -> frameRows,
    "win_frame_range" -> frameRange,
    "win_running" -> running,
    "win_first_last" -> firstLast
  )

  def oracle: Map[String, String] = Map(
    // operate on µs-truncated timestamps (make_timestamp of epoch_us) so
    // the RANGE frame boundaries match Spark's µs TimestampType exactly
    // (the raw parquet column is TIMESTAMP_NS on the DuckDB side)
    "win_frame_time" ->
      ("WITH e AS (SELECT user_id, event_id, " +
        "make_timestamp(epoch_us(ts)) AS ts, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events) " +
        "SELECT user_id, event_id, epoch_us(ts) AS ts_us, " +
        "count(*) OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h, " +
        "sum(cents) OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) / 100.0 " +
        "AS sum_1h " +
        "FROM e ORDER BY user_id, ts_us, event_id"),
    "win_distinct_running" ->
      ("SELECT user_id, event_id, " +
        "count(DISTINCT event_type) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS distinct_types_so_far " +
        "FROM events ORDER BY event_id"),
    "win_rolling_median" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events) " +
        "SELECT user_id, event_id, " +
        "median(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100 " +
        "AS rolling_median, " +
        "CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS frame_size " +
        "FROM e ORDER BY event_id"),
    "win_ignore_nulls" ->
      ("SELECT event_id, user_id, nullif(event_type, 'error') AS et, " +
        "lag(nullif(event_type, 'error') IGNORE NULLS) OVER w AS prev_nonnull, " +
        "last_value(nullif(event_type, 'error') IGNORE NULLS) OVER " +
        "(w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY event_id"),
    "win_nth_value" ->
      ("SELECT o_custkey, o_orderkey, " +
        "nth_value(o_totalprice, 2) OVER (ord ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS second_so_far, " +
        "nth_value(o_totalprice, 3) OVER (ord ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND UNBOUNDED FOLLOWING) AS third_overall " +
        "FROM orders WINDOW ord AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
    "win_cume_dist" ->
      ("SELECT o_custkey, o_orderkey, " +
        "cume_dist() OVER w AS cd, percent_rank() OVER w AS pr " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
    "win_rank_topn" ->
      ("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "win_rank_variants" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, " +
        "rank() OVER tied AS rnk, dense_rank() OVER tied AS drnk, " +
        "percent_rank() OVER tied AS pct_rnk, " +
        "ntile(4) OVER (PARTITION BY l_orderkey ORDER BY l_quantity, l_linenumber) AS tile " +
        "FROM lineitem " +
        "WINDOW tied AS (PARTITION BY l_orderkey ORDER BY l_quantity) " +
        "ORDER BY l_orderkey, l_linenumber"),
    "win_analytic" ->
      ("SELECT event_id, user_id, value, " +
        "lag(value, 1) OVER w AS prev_value, " +
        "lead(value, 1) OVER w AS next_value, " +
        "epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY event_id"),
    "win_frame_rows" ->
      ("SELECT event_id, user_id, " +
        "round(sum(value) OVER w, 4) AS rolling3_sum, " +
        "count(*) OVER w AS rolling3_n " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    "win_frame_range" ->
      ("SELECT event_id, event_type, epoch_us(ts) AS ts_us, " +
        "CAST(CAST(round(sum(value) OVER w * 100) AS BIGINT) AS DOUBLE) " +
        "/ (count(*) OVER w * 100.0) AS mov_avg " +
        "FROM events WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    "win_running" ->
      ("SELECT o_custkey, o_orderkey, " +
        "round(sum(o_totalprice) OVER w, 2) AS running_total, " +
        "count(*) OVER w AS running_n " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "ORDER BY o_custkey, running_n"),
    "win_first_last" ->
      ("SELECT event_id, user_id, " +
        "first_value(v IGNORE NULLS) OVER w AS first_ok_value, " +
        "last_value(v IGNORE NULLS) OVER w AS last_ok_value " +
        "FROM (SELECT *, CASE WHEN event_type <> 'error' THEN value END AS v " +
        "FROM events) " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY event_id")
  )
}
