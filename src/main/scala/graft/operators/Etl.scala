package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's canonical NOAA-daily ETL chain (SURVEY.md §1.1),
  * re-expressed Spark-first on the fixtures: fixed-width parse (station
  * dimension files), quality-flag filtering + tenths→units conversion +
  * long→wide pivot + dimension join in one declarative plan, and the
  * idempotent day-partitioned upsert that makes a daily batch re-runnable.
  *
  * Scale notes (100 TB): the daily pipeline is one scan → filter →
  * pivot-aggregate (single exchange on (day, station)) → broadcast dim
  * join; the upsert uses dynamic partition overwrite so a re-run replaces
  * exactly the affected day partitions — the standard idempotent
  * daily-load contract.
  */
object Etl {

  /** Fixed-width text roundtrip: render the nation dim as fixed-width
    * lines (the NOAA station-file format family), read back with
    * substring/trim/cast parsing. Oracle: the original table.
    */
  def fixedWidth(spark: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Staging.memoDir("graft_fixed", dir) { tmp =>
      Tables(spark, dir, "nation")
        .select(format_string("%-4d%-20s%-4d",
          col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    spark.read.text(tmp)
      .select(
        trim(substring(col("value"), 1, 4)).cast("int").as("n_nationkey"),
        trim(substring(col("value"), 5, 20)).as("n_name"),
        trim(substring(col("value"), 25, 4)).cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** The reference's daily job in one plan, on the events/customer
    * fixtures standing in for observations/stations: drop quality-flagged
    * rows (`error`), convert tenths→units, pivot elements long→wide per
    * (day, station) with exact milli-unit averages, join the station
    * dimension. Output stays at (day, station) grain so every value is
    * exact.
    */
  def noaaDaily(spark: SparkSession, dir: String): DataFrame = {
    val elements = Seq("signup", "click", "view", "purchase")
    val wide = Tables(spark, dir, "events")
      .filter(col("event_type") =!= "error")
      .withColumn("v", col("value") / 10.0)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id").as("station"))
      .pivot("event_type", elements)
      .agg(round(sum("v") * 1000, 0).cast("long").cast("double")
        / (count(lit(1)) * 1000).cast("double"))
    val dim = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    wide.join(broadcast(dim), wide("station") === dim("c_custkey"))
      .select(col("day"), col("station"), col("c_mktsegment"),
        col("signup").as("avg_signup"), col("click").as("avg_click"),
        col("view").as("avg_view"), col("purchase").as("avg_purchase"))
      .orderBy("day", "station")
  }

  /** Idempotent daily upsert: events written day-partitioned, then one
    * day re-loaded from (deliberately duplicated) input with dedup on the
    * natural key under dynamic partition overwrite — only that day's
    * partition is replaced, and the re-run leaves counts unchanged
    * (which is exactly what the oracle checks).
    */
  def upsertPartition(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_id"), col("user_id"), col("event_type"), col("value"))
    // base layout staged once per (key, sf); the upsert below re-runs per
    // call and is idempotent, so the re-used dir converges to the same state.
    // repartition on the partition column first: without it every task
    // writes a sliver of every day → tasks × days tiny files (the
    // small-files problem at any scale; measured 2.7 s → ~1 s here)
    val tmp = graft.Staging.memoDir("graft_upsert", dir) { tmp =>
      e.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
    }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val day = e.filter(col("day") === "2024-01-05")
      day.union(day).dropDuplicates("event_id")
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
        v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
    }
    spark.read.parquet(tmp)
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day")
  }

  /** Ordered conversion funnel (view → click → purchase): per user, the
    * first view, the first click strictly after it, the first purchase
    * strictly after that; output is the stage population counts. All
    * three stages aggregate and join on the SAME key (user_id), so the
    * exchange is planned once and reused — one logical shuffle for the
    * whole funnel, the shape that survives a 100 TB event log.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_view"),
        count(col("c_ts")).as("n_click"),
        count(col("p_ts")).as("n_purchase"))
  }

  /** SCD type-2 dimension build: per user, collapse the event stream to
    * its event_type CHANGE points and attach validity intervals —
    * `valid_from_us` = change timestamp, `valid_to_us` = next change (null
    * ⇒ current row). The standard warehouse history-table shape, derived
    * declaratively: one lag() to detect changes, a filter, one lead() for
    * the closing edge. Both windows share the same (user_id; ts,
    * event_id) partitioning+ordering, so Catalyst plans ONE exchange +
    * sort and the second Window reuses it — at 100 TB this is a single
    * shuffle over the event log, no self-join.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(lead("ts", 1).over(w)).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy("user_id", "valid_from_us")
  }

  /** One-pass data-quality audit over the fact table: null counts,
    * domain-range violations, duplicate natural keys, and referential
    * orphans — the checks a daily load gate runs before publishing a
    * partition. All but the orphan check ride ONE aggregation over one
    * scan (conditional sums + a two-column distinct); orphans are a
    * left_anti against the parent keys. Output is tidy (check_name,
    * n_violations) rows via stack().
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val base = li.agg(
      sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_quantity"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)
        .otherwise(0)).as("range_quantity"),
      sum(when(col("l_discount") < 0
        || col("l_discount") > lit(0.10).cast("double"), 1)
        .otherwise(0)).as("range_discount"),
      (count(lit(1))
        - countDistinct(col("l_orderkey"), col("l_linenumber")))
        .as("dup_natural_key"))
    val orphans = li.select("l_orderkey")
      .join(Tables(spark, dir, "orders").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitem"))
    base.crossJoin(orphans)
      .selectExpr("stack(5, " +
        "'dup_natural_key', dup_natural_key, " +
        "'null_quantity', null_quantity, " +
        "'orphan_lineitem', orphan_lineitem, " +
        "'range_discount', range_discount, " +
        "'range_quantity', range_quantity) AS (check_name, n_violations)")
      .orderBy("check_name")
  }

  /** Cohort retention: users grouped by first-seen day, counted on each
    * later activity day as (cohort_day, days_since) distinct actives —
    * the standard product-analytics retention triangle. Two aggregations
    * and one join, ALL keyed on user_id/day: cohort assignment is a
    * per-user min, the join back to activity is user-keyed (shuffle
    * hash at scale — the cohort table is user-dimension sized), and the
    * final distinct-count shuffles the (cohort, offset) pairs only.
    */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("days_since"))
      .agg(countDistinct("user_id").as("n_active"))
      .withColumn("cohort_day", col("cohort_day").cast("string"))
      .orderBy("cohort_day", "days_since")
  }

  /** Calendar gap-fill + last-observation-carried-forward: per-user daily
    * rollups joined against a generated day spine (min→max day per user),
    * missing days emitted with zero counts and the previous day's value
    * carried forward. The spine is `sequence` + `explode` — pure map-side
    * generation, no driver loop; the LOCF is one window pass over the
    * already user-partitioned join output, so the whole fill costs a
    * single user-keyed shuffle. Day sums go through the integer-cent grid
    * so the carried doubles are bit-identical cross-engine ([[graft.Det]]).
    * The standard time-series regularization step before any rolling
    * statistic.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"),
        (last("cents", ignoreNulls = true).over(w) / lit(100.0))
          .as("carried_value"))
      .orderBy("user_id", "day")
  }

  /** PERMISSIVE ingestion with a dead-letter column: malformed CSV rows
    * land with the raw line captured in `_corrupt` and the unparseable
    * field nulled, instead of failing the task — at 100 TB the
    * `_corrupt IS NOT NULL` slice routes to a quarantine sink while the
    * job keeps running (the batch counterpart of a streaming dead-letter
    * queue). Malformed fixture lines are synthesized deterministically
    * (every 7th key gets a non-numeric region), so the oracle can state
    * the expected split exactly.
    */
  def malformedSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = graft.Staging.memoDir("graft_dlq", dir) { tmp =>
      Tables(spark, dir, "nation")
        .select(concat_ws(",",
          col("n_nationkey"), col("n_name"),
          when(col("n_nationkey") % 7 === 0, lit("bad"))
            .otherwise(col("n_regionkey").cast("string"))).as("value"))
        .write.mode("overwrite").text(tmp)
    }
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType),
      StructField("_corrupt", StringType)))
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(tmp)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col("_corrupt").isNotNull.as("is_dead_letter"),
        col("_corrupt").as("raw_line"))
      .orderBy("n_nationkey")
  }

  /** Snapshot diff (batch CDC): classify every key across two table
    * versions as added / removed / changed via ONE full-outer join on the
    * key — the standard way to derive a change feed when the source can't
    * emit one. The "new" snapshot is synthesized deterministically from
    * orders (every 97th key deleted, every 13th repriced +1, every 89th
    * re-inserted shifted by 10M), so the oracle can state the exact diff.
    * At 100 TB both sides shuffle once on the key; emitting only
    * non-unchanged rows keeps the output the size of the change set, not
    * the table.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"))
    val newBase = old.filter(col("key") % 97 =!= 0)
      .withColumn("price",
        when(col("key") % 13 === 0, col("price") + 1).otherwise(col("price")))
    val inserted = old.filter(col("key") % 89 === 0)
      .select((col("key") + 10000000L).as("key"), col("price"))
    val neu = newBase.unionByName(inserted)
    old.select(col("key"), col("price").as("old_price"))
      .join(neu.select(col("key"), col("price").as("new_price")),
        Seq("key"), "full_outer")
      .withColumn("change_type",
        when(col("old_price").isNull, "added")
          .when(col("new_price").isNull, "removed")
          .when(col("old_price") =!= col("new_price"), "changed")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select("key", "change_type", "old_price", "new_price")
      .orderBy("key")
  }

  /** Globally-dense deterministic surrogate keys WITHOUT a global sort:
    * the naive `row_number() OVER (ORDER BY key)` plans a single-
    * partition exchange (one task holds the corpus), and
    * `monotonically_increasing_id` is dense only per partition and not
    * reproducible across layouts. The scale shape is two passes:
    * (1) one tiny aggregate derives explicit key-range buckets and their
    * cumulative row offsets (8 rows, broadcast); (2) rows rank WITHIN
    * their bucket (parallel window, one bucket-keyed exchange) and add
    * the bucket's offset. Result ≡ the global row_number, bit-for-bit,
    * at any partition count — which is exactly what the oracle states.
    */
  def surrogateKey(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val mx = c.agg(max("c_custkey").as("mx"))
    val bucketed = c.crossJoin(broadcast(mx))
      .withColumn("bkt", floor(col("c_custkey") * 8 / (col("mx") + 1)))
    val offsets = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum("cnt").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "offset")
    val wB = Window.partitionBy("bkt").orderBy("c_custkey")
    bucketed
      .withColumn("rk", row_number().over(wB))
      .join(broadcast(offsets), Seq("bkt"))
      .select(col("c_custkey"), col("c_name"),
        (col("offset") + col("rk")).as("sk"))
      .orderBy("sk")
  }

  /** Bloom-pruned incremental ingest: classify each post-cutoff order by
    * whether its customer appeared BEFORE the cutoff. The history side is
    * collapsed to a [[org.apache.spark.util.sketch.BloomFilter]]
    * (`df.stat.bloomFilter` — a mergeable sketch aggregate, kilobytes at
    * any history size) and only bloom HITS pay the exact semi-join; bloom
    * misses are definitely-new (no false negatives) and skip the join
    * entirely. At 100 TB this is the standard two-tier change-detection
    * topology: the sketch prunes the expensive join to the candidate set.
    * Output exposes both tiers (`bloom_hit`, exact `known_customer`) so
    * the false-positive band is measurable; the EXACT column is
    * oracle-verified, the bloom column is property-tested (no false
    * negatives, FP rate bounded — Wave13Spec).
    */
  def bloomIncremental(spark: SparkSession, dir: String): DataFrame = {
    val cut = "1998-01-01 00:00:00"
    val orders = Tables(spark, dir, "orders")
    val history = orders.filter(col("o_orderdate") < lit(cut).cast("timestamp"))
      .select(col("o_custkey"))
    val incoming = orders
      .filter(col("o_orderdate") >= lit(cut).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val bloom = history.stat.bloomFilter("o_custkey", 2000, 0.03)
    val mightContain = udf((k: Long) => bloom.mightContainLong(k))
    val known = history.distinct().withColumn("known_customer", lit(true))
    incoming
      .withColumn("bloom_hit", mightContain(col("o_custkey")))
      .join(known, Seq("o_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("bloom_hit"),
        coalesce(col("known_customer"), lit(false)).as("known_customer"))
      .orderBy("o_orderkey")
  }

  /** Day-of-year climate normals (the NOAA-normals product shape): per
    * (doy, event_type) mean on the integer-cent grid, plus a ±7-day
    * RANGE-frame smoothed normal. Both averages divide exact integer
    * sums — the windowed sum is a sum of per-doy integer cent totals, so
    * even the smoothed value is order-independent and bit-identical on
    * any engine/partitioning. One aggregate + one partitioned window.
    */
  def climateNormals(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables(spark, dir, "events")
      .groupBy(dayofyear(col("ts")).as("doy"), col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val w = Window.partitionBy("event_type").orderBy("doy")
      .rangeBetween(-7, 7)
    per
      .select(col("doy"), col("event_type"), col("n_obs"),
        (col("cents").cast("double") / (col("n_obs") * 100))
          .as("normal_value"),
        (sum("cents").over(w).cast("double")
          / (sum("n_obs").over(w) * 100)).as("smoothed_value"))
      .orderBy("event_type", "doy")
  }

  /** Station-style QC: flag observations beyond 2 sample standard
    * deviations of the station's (user's) own history. The test is a
    * PURE INTEGER inequality — (n−1)·(v·n−Σv)² > 4n·(n·Σv²−(Σv)²) on
    * the cent grid — so the flag decision is bit-identical across
    * engines with NO float boundary risk (an `abs(v-mean) > 2σ` of
    * doubles ties at the ulp). The inequality terms are computed as
    * DecimalType(38,0): in Long the products reach (n−1)·(v·n−Σv)² and
    * n·Σv², which wrap silently past 2^63 (Spark non-ANSI) while DuckDB
    * errors — decimal keeps the comparison exact to 10^38, far beyond
    * any per-station history (n·Σv² < 10^38 holds to ~10^13 rows/station
    * at 10^5-cent values). Past 10^38 non-ANSI decimal arithmetic
    * yields NULL, not an error — which would silently UNFLAG the
    * overflowing rows — so a null inequality on a non-null observation
    * raises explicitly (overflow is loud by mechanism, not by
    * assumption; advisor round-4 note). Per-station stats ride a
    * partitioned window; one aggregate emits per-station totals.
    */
  def stationQc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val wU = Window.partitionBy("user_id")
    val v = round(col("value") * 100, 0).cast("long")
    val qc = {
      val dn = dec(col("n")); val ds = dec(col("s"))
      val dsq = dec(col("sq")); val dv = dec(col("v"))
      val diff = dv * dn - ds
      (dn - lit(1)) * diff * diff > lit(4) * dn * (dn * dsq - ds * ds)
    }
    Tables(spark, dir, "events")
      .select(col("user_id"), v.as("v"))
      .withColumn("n", count(lit(1)).over(wU))
      .withColumn("s", sum("v").over(wU))
      .withColumn("sq", sum(dec(col("v")) * dec(col("v"))).over(wU))
      // a NULL inequality on a non-null observation means the decimal
      // arithmetic overflowed 10^38 (non-ANSI overflow = null) — raise
      // instead of letting count(when(flag,1)) silently skip the row
      .withColumn("flag",
        when(col("v").isNotNull && col("n") > 1 && qc.isNull,
          raise_error(lit("stationQc: DecimalType(38,0) overflow in the " +
            "2-sigma inequality — widen the grid")).cast("boolean"))
          .otherwise(col("n") > 1 && qc))
      .groupBy("user_id")
      .agg(max("n").as("n_obs"),
        count(when(col("flag"), 1)).as("n_flagged"))
      .orderBy("user_id")
  }

  /** Longest consecutive-day streak per user — the gaps-and-islands
    * pattern on the calendar: distinct active days, island key =
    * day − row_number (constant within a run of consecutive days), one
    * aggregate per island, one per user. Two user-keyed shuffles total;
    * the window is partitioned (never global).
    */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("day")
    Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(byUser)))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** Heating/cooling degree days per month (base 300.00 on the value
    * scale): clamped differences summed on the integer-cent grid —
    * pure map-side arithmetic ahead of one month-keyed aggregate.
    */
  def degreeDays(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    Tables(spark, dir, "events")
      .groupBy(month(col("ts")).cast("long").as("mth"))
      .agg(
        (sum(greatest(lit(0L), lit(30000L) - cents)).cast("double") / 100)
          .as("heating_dd"),
        (sum(greatest(lit(0L), cents - lit(30000L))).cast("double") / 100)
          .as("cooling_dd"))
      .orderBy("mth")
  }

  /** Time-weighted LINEAR interpolation of missing observations (a
    * deterministic synthetic gap: every 7th event): previous and next
    * known (value, timestamp) via ignoreNulls window frames over ONE
    * user-keyed sort, then the interpolation formula in a fixed
    * operand order on exact integer inputs — bit-identical across
    * engines. Boundary gaps fall back to the single known neighbor, and
    * so does a DEGENERATE bracket (nt = pt, possible under duplicate
    * per-user timestamps): without that guard the linear branch divides
    * by zero — Spark (non-ANSI) yields NaN/Infinity where DuckDB errors
    * (advisor round-4 note; the guard is mirrored in the oracle SQL).
    * The time-series upgrade of etl_gap_fill's constant fill.
    */
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val back = order.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = order.rowsBetween(1, Window.unboundedFollowing)
    val tUs = unix_micros(col("ts"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_id") % 7 =!= 0,
          round(col("value") * 100, 0).cast("long")).as("v"))
      .withColumn("pv", last("v", ignoreNulls = true).over(back))
      .withColumn("pt", last(when(col("v").isNotNull, tUs), ignoreNulls = true)
        .over(back))
      .withColumn("nv", first("v", ignoreNulls = true).over(fwd))
      .withColumn("nt", first(when(col("v").isNotNull, tUs), ignoreNulls = true)
        .over(fwd))
      .select(col("event_id"), col("user_id"),
        round(
          when(col("v").isNotNull, col("v").cast("double") / 100)
            .when(col("pv").isNotNull && col("nv").isNotNull
                && col("nt") =!= col("pt"),
              (col("pv").cast("double")
                + (col("nv") - col("pv")).cast("double")
                  * (tUs - col("pt")).cast("double")
                  / (col("nt") - col("pt")).cast("double")) / 100)
            .otherwise(coalesce(col("pv"), col("nv")).cast("double") / 100),
          4).as("filled"),
        col("v").isNull.as("was_missing"))
      .orderBy("event_id")
  }

  /** Incremental view maintenance by ALGEBRAIC partial-state merge: the
    * standing aggregate (per-type counts/sums over all history) is kept
    * as day-grained partial states; a new day's batch is aggregated
    * ALONE and merged into the standing states — history is never
    * rescanned. The demo materializes "yesterday's" states (days before
    * the cut) and "today's" delta separately, then produces the final
    * view purely from the merged states.
    *
    * The states are (count, value-cents-sum, min/max day) — all
    * commutative monoids, and the cents sum is an INTEGER, so the merge
    * is exact and order-independent regardless of how many increments
    * the state has absorbed (the §5.3 grid discipline is precisely what
    * makes incremental maintenance safe: float partials would drift
    * from the recompute answer batch by batch). At 100 TB this is the
    * difference between an O(day) nightly pipeline and an O(history)
    * one; the oracle IS the full recompute, so hash equality proves
    * merge ≡ recompute.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("day", to_date(col("ts")))
    def states(batch: DataFrame): DataFrame = batch
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val cut = lit("2024-01-20").cast("date")
    val standing = states(ev.filter(col("day") < cut)) // materialized view
    val delta = states(ev.filter(col("day") >= cut)) // today's batch only
    standing.unionByName(delta)
      .groupBy("event_type")
      .agg(sum("n").as("n_events"),
        (sum("cents").cast("double") / 100).as("sum_value"),
        (sum("cents").cast("double") / 100 / sum("n")).as("avg_value"),
        min("day").cast("string").as("first_day"),
        max("day").cast("string").as("last_day"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_incremental_agg" -> incrementalAgg,
    "etl_streaks" -> streaks,
    "etl_degree_days" -> degreeDays,
    "etl_interpolate" -> interpolate,
    "etl_climate_normals" -> climateNormals,
    "etl_station_qc" -> stationQc,
    "etl_bloom_incremental" -> bloomIncremental,
    "etl_surrogate_key" -> surrogateKey,
    "etl_snapshot_diff" -> snapshotDiff,
    "etl_gap_fill" -> gapFill,
    "etl_malformed_split" -> malformedSplit,
    "etl_retention_cohort" -> retentionCohort,
    "etl_dq_checks" -> dqChecks,
    "etl_scd2" -> scd2,
    "etl_funnel" -> funnel,
    "scan_fixed_width" -> fixedWidth,
    "etl_noaa_daily" -> noaaDaily,
    "sink_upsert_partition" -> upsertPartition
  )

  def oracle: Map[String, String] = Map(
    "etl_incremental_agg" ->
      ("SELECT event_type, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 " +
        "AS sum_value, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 " +
        "/ count(*) AS avg_value, " +
        "CAST(min(CAST(ts AS DATE)) AS VARCHAR) AS first_day, " +
        "CAST(max(CAST(ts AS DATE)) AS VARCHAR) AS last_day " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "etl_streaks" ->
      ("WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "i AS (SELECT user_id, day, CAST(day - CAST(row_number() OVER (" +
        "PARTITION BY user_id ORDER BY day) AS INTEGER) AS DATE) AS grp FROM d), " +
        "s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len " +
        "FROM i GROUP BY 1, 2) " +
        "SELECT user_id, max(len) AS longest_streak, " +
        "CAST(count(*) AS BIGINT) AS n_streaks " +
        "FROM s GROUP BY 1 ORDER BY user_id"),
    "etl_degree_days" ->
      ("SELECT CAST(month(ts) AS BIGINT) AS mth, " +
        "CAST(sum(greatest(0, 30000 - CAST(round(value * 100) AS BIGINT))) " +
        "AS DOUBLE) / 100 AS heating_dd, " +
        "CAST(sum(greatest(0, CAST(round(value * 100) AS BIGINT) - 30000)) " +
        "AS DOUBLE) / 100 AS cooling_dd " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "etl_interpolate" ->
      ("WITH base AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN event_id % 7 <> 0 THEN CAST(round(value * 100) AS BIGINT) END AS v " +
        "FROM events), " +
        "w AS (SELECT *, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv, " +
        "last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt, " +
        "first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv, " +
        "first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt FROM base) " +
        "SELECT event_id, user_id, " +
        "round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE) / 100 " +
        "WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt THEN " +
        "(CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) " +
        "* CAST(epoch_us(ts) - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) / 100 " +
        "ELSE CAST(coalesce(pv, nv) AS DOUBLE) / 100 END, 4) AS filled, " +
        "(v IS NULL) AS was_missing " +
        "FROM w ORDER BY event_id"),
    "etl_climate_normals" ->
      ("WITH n AS (SELECT dayofyear(ts) AS doy, event_type, " +
        "CAST(count(*) AS BIGINT) AS n_obs, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents " +
        "FROM events GROUP BY 1, 2) " +
        "SELECT doy, event_type, n_obs, " +
        "CAST(cents AS DOUBLE) / (100 * n_obs) AS normal_value, " +
        "CAST(sum(cents) OVER w AS DOUBLE) / (100 * sum(n_obs) OVER w) " +
        "AS smoothed_value FROM n " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY doy " +
        "RANGE BETWEEN 7 PRECEDING AND 7 FOLLOWING) " +
        "ORDER BY event_type, doy"),
    "etl_station_qc" ->
      ("WITH g AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v " +
        "FROM events), " +
        "st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS sq " +
        "FROM g GROUP BY 1) " +
        "SELECT g.user_id, max(st.n) AS n_obs, " +
        "CAST(count(CASE WHEN st.n > 1 AND " +
        "(st.n - 1) * (g.v * st.n - st.s) * (g.v * st.n - st.s) " +
        "> 4 * st.n * (st.n * st.sq - st.s * st.s) THEN 1 END) AS BIGINT) " +
        "AS n_flagged " +
        "FROM g JOIN st ON g.user_id = st.user_id " +
        "GROUP BY 1 ORDER BY g.user_id"),
    "etl_surrogate_key" ->
      ("SELECT c_custkey, c_name, " +
        "row_number() OVER (ORDER BY c_custkey) AS sk " +
        "FROM customer ORDER BY sk"),
    "etl_snapshot_diff" ->
      ("WITH old AS (SELECT o_orderkey AS key, o_totalprice AS price " +
        "FROM orders), " +
        "neu AS (SELECT key, CASE WHEN key % 13 = 0 THEN price + 1 " +
        "ELSE price END AS price FROM old WHERE key % 97 <> 0 " +
        "UNION ALL SELECT key + 10000000, price FROM old " +
        "WHERE key % 89 = 0) " +
        "SELECT * FROM (" +
        "SELECT coalesce(o.key, n.key) AS key, " +
        "CASE WHEN o.key IS NULL THEN 'added' " +
        "WHEN n.key IS NULL THEN 'removed' " +
        "WHEN o.price <> n.price THEN 'changed' " +
        "ELSE 'unchanged' END AS change_type, " +
        "o.price AS old_price, n.price AS new_price " +
        "FROM old o FULL OUTER JOIN neu n ON o.key = n.key) " +
        "WHERE change_type <> 'unchanged' ORDER BY key"),
    "etl_gap_fill" ->
      ("WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "count(*) AS n_events, " +
        "sum(CAST(round(value * 100) AS BIGINT)) AS cents " +
        "FROM events GROUP BY 1, 2), " +
        "s AS (SELECT user_id, CAST(unnest(generate_series(min(day), " +
        "max(day), INTERVAL 1 DAY)) AS DATE) AS day FROM d GROUP BY user_id) " +
        "SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day, " +
        "coalesce(d.n_events, 0) AS n_events, " +
        "d.n_events IS NULL AS is_gap, " +
        "CAST(last_value(d.cents IGNORE NULLS) OVER (" +
        "PARTITION BY s.user_id ORDER BY s.day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 " +
        "AS carried_value " +
        "FROM s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day " +
        "ORDER BY s.user_id, day"),
    "etl_malformed_split" ->
      ("SELECT n_nationkey, n_name, " +
        "CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_regionkey END " +
        "AS n_regionkey, " +
        "n_nationkey % 7 = 0 AS is_dead_letter, " +
        "CASE WHEN n_nationkey % 7 = 0 THEN CAST(n_nationkey AS VARCHAR) " +
        "|| ',' || n_name || ',bad' END AS raw_line " +
        "FROM nation ORDER BY n_nationkey"),
    "etl_retention_cohort" ->
      ("WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day " +
        "FROM events), " +
        "cohort AS (SELECT user_id, min(day) AS cohort_day FROM act " +
        "GROUP BY 1) " +
        "SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, " +
        "CAST(day - cohort_day AS BIGINT) AS days_since, " +
        "count(DISTINCT act.user_id) AS n_active " +
        "FROM act JOIN cohort ON act.user_id = cohort.user_id " +
        "GROUP BY cohort.cohort_day, day - cohort_day " +
        "ORDER BY cohort_day, days_since"),
    "etl_dq_checks" ->
      ("WITH a AS (SELECT " +
        "CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_quantity, " +
        "CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS range_quantity, " +
        "CAST(sum(CASE WHEN l_discount < 0 OR l_discount > CAST(0.10 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS range_discount, " +
        "count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_natural_key " +
        "FROM lineitem), " +
        "o AS (SELECT count(*) AS orphan_lineitem FROM lineitem " +
        "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) " +
        "SELECT 'dup_natural_key' AS check_name, dup_natural_key AS n_violations FROM a " +
        "UNION ALL SELECT 'null_quantity', null_quantity FROM a " +
        "UNION ALL SELECT 'orphan_lineitem', orphan_lineitem FROM o " +
        "UNION ALL SELECT 'range_discount', range_discount FROM a " +
        "UNION ALL SELECT 'range_quantity', range_quantity FROM a " +
        "ORDER BY check_name"),
    "etl_scd2" ->
      ("WITH chg AS (SELECT user_id, event_type, ts, event_id, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS prev_type FROM events), " +
        "scd AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from_us, " +
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS valid_to_us FROM chg " +
        "WHERE prev_type IS NULL OR prev_type <> event_type) " +
        "SELECT user_id, event_type, valid_from_us, valid_to_us, " +
        "valid_to_us IS NULL AS is_current " +
        "FROM scd ORDER BY user_id, valid_from_us"),
    "etl_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e " +
        "JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts " +
        "WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e " +
        "JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts " +
        "WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT count(*) AS n_view, count(c.c_ts) AS n_click, " +
        "count(p.p_ts) AS n_purchase " +
        "FROM v LEFT JOIN c ON v.user_id = c.user_id " +
        "LEFT JOIN p ON v.user_id = p.user_id"),
    "scan_fixed_width" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "etl_noaa_daily" ->
      ("WITH clean AS (SELECT strftime(ts, '%Y-%m-%d') AS day, " +
        "user_id AS station, event_type, value / 10.0 AS v " +
        "FROM events WHERE event_type <> 'error'), " +
        "wide AS (SELECT day, station, " +
        Seq("signup", "click", "view", "purchase").map { t =>
          s"CAST(CAST(round(sum(CASE WHEN event_type='$t' THEN v END)*1000) " +
            s"AS BIGINT) AS DOUBLE)/(count(CASE WHEN event_type='$t' THEN v END)*1000.0) " +
            s"AS avg_$t"
        }.mkString(", ") +
        " FROM clean GROUP BY 1, 2) " +
        "SELECT day, station, c_mktsegment, avg_signup, avg_click, " +
        "avg_view, avg_purchase " +
        "FROM wide JOIN customer ON station = c_custkey " +
        "ORDER BY day, station"),
    "sink_upsert_partition" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n " +
        "FROM events GROUP BY 1 ORDER BY 1")
  )
}
