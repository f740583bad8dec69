package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
import graft.Tables

/** SURVEY.md §2.7 — scalar function families.
  *
  * Everything here is a codegen'd builtin (`org.apache.spark.sql.
  * functions._` / Spark SQL expressions) — no Scala closures, so every
  * query stays inside WholeStageCodegen. Outputs are restricted to values
  * that are bit-exact across Spark and DuckDB (strings, longs, exact
  * float/double ops); transcendentals are rounded to 6 decimals.
  */
object ScalarFns {

  def fnString(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        length(col("p_name")).cast("long").as("len"),
        regexp_replace(col("p_name"), " ", "_").as("rep"),
        lpad(col("p_type"), 10, ".").as("lp"),
        instr(col("p_name"), "e").cast("long").as("pos_e"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"))
      .orderBy("p_partkey")

  def fnDate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")
          .as("plus30"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_y2k"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"))
      .orderBy("o_orderkey")

  def fnMath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 0).as("r0"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        pow(col("l_quantity"), 2).as("p2"),
        sqrt(col("l_quantity")).as("sq"),
        round(log(col("l_extendedprice")), 6).as("ln6"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_quantity"), col("l_tax") * 100).as("le"),
        signum(col("l_discount") - 0.05).as("sg"),
        (col("l_orderkey") % 7).as("m7"),
        expr("l_orderkey div 7").as("d7"))
      .orderBy("l_orderkey", "l_linenumber")

  def fnCond(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        expr("if(c_mktsegment = 'BUILDING', 1L, 0L)").as("is_building"),
        coalesce(expr("nullif(c_mktsegment, 'MACHINERY')"), lit("machines"))
          .as("seg_repl"),
        col("c_custkey").cast("double").as("key_dbl"),
        col("c_custkey").cast("string").as("key_str"))
      .orderBy("c_custkey")

  /** Higher-order functions. Float ops limited to exact ones (element
    * access, slice, max, sort); arithmetic HOFs run on integer arrays so
    * both engines agree bit-for-bit. Array-typed columns are serialized
    * to comma-joined strings (or reduced to scalars) because the driver's
    * generic comparator cannot sort array columns (round-1 gate error);
    * the slice/sort/transform/filter semantics are still fully exercised
    * — only the output representation changed.
    */
  def fnArray(spark: SparkSession, dir: String): DataFrame = {
    def s(c: org.apache.spark.sql.Column) =
      concat_ws(",", transform(c, _.cast("string")))
    Tables(spark, dir, "embeddings")
      .withColumn("ints",
        sequence(lit(1L), (col("label") + lit(2)).cast("long")))
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(slice(col("embedding"), 1, 4), 4).as("head4_last"),
        array_max(col("embedding")).as("maxv"),
        element_at(sort_array(slice(col("embedding"), 1, 4)), 1)
          .as("sorted_min"),
        array_contains(col("ints"), 3L).as("has3"),
        s(col("ints")).as("ints_s"),
        s(transform(col("ints"), x => x * x)).as("squares_s"),
        s(filter(col("ints"), x => x % 2 === 0)).as("evens_s"),
        aggregate(col("ints"), lit(0L), (acc, x) => acc + x).as("total"))
      .orderBy("vec_id")
  }

  def fnMap(spark: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), MapType(StringType, IntegerType))
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        concat_ws(",", map_keys(m)).as("ks"),
        element_at(m, "k").cast("long").as("kv"),
        element_at(
          map_from_entries(array(struct(lit("et"), col("event_type")))),
          "et").as("mv"))
      .orderBy("event_id")
  }

  def fnJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("jk"),
        to_json(struct(col("event_id"), col("event_type"))).as("js"),
        schema_of_json(lit("""{"k":1}""")).as("sch"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", IntegerType))))
          .getField("k").cast("long").as("parsed_k"))
      .orderBy("event_id")

  def fnExplode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("word"))
      .orderBy("doc_id", "pos")

  def fnString2(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        translate(col("p_name"), "aeiou", "12345").as("tr"),
        repeat(col("p_brand"), 2).as("rep2"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 3)").as("r3"),
        col("p_name").contains("gear").as("has_gear"),
        md5(col("p_name").cast("binary")).as("name_md5"))
      .orderBy("p_partkey")

  def fnDate2(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus3m"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  def fnBitwise(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("band"),
        (col("o_orderkey").bitwiseOR(lit(16L))).as("bor"),
        (col("o_orderkey").bitwiseXOR(lit(255L))).as("bxor"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 1).as("shr"))
      .orderBy("o_orderkey")

  /** Struct build / field access / reconstruction — nested types flowing
    * through a projection, flattened back to scalars for the gate.
    */
  def fnStruct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .withColumn("o",
        struct(col("o_orderstatus").as("st"), col("o_orderkey").as("k"),
          col("o_totalprice").as("p")))
      .select(
        col("o_orderkey"),
        col("o").getField("st").as("st"),
        (col("o").getField("p") * 2).as("p2"),
        to_json(struct(col("o").getField("st").as("s"),
          col("o").getField("k").as("k"))).as("js"))
      .orderBy("o_orderkey")

  /** Regex family: extract-all (serialized — array outputs are
    * unsortable in the driver gate), counts via the same list, and a
    * regex filter.
    */
  def fnRegexp(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_name").rlike("^[a-z]+ "))
      .select(
        col("p_partkey"),
        array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), ",")
          .as("words"),
        size(expr("regexp_extract_all(p_name, '[aeiou]', 0)")).cast("long")
          .as("n_vowels"),
        regexp_extract(col("p_name"), "^(\\w+) (\\w+)", 2).as("second_word"))
      .orderBy("p_partkey")

  /** Cryptographic / encoding function family: md5, sha2-256, base64,
    * hex — the content-addressing primitives of a dedup pipeline (stable
    * doc ids, shard-invariant fingerprints).
    */
  def fnHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        base64(col("c_name").cast("binary")).as("b64"),
        hex(col("c_name").cast("binary")).as("hx"))
      .orderBy("c_custkey")

  /** URL handling: construct a canonical URL per document, then take it
    * apart again with `parse_url` (HOST / PATH / QUERY / a single query
    * parameter). DuckDB 1.0 has no URL parser, so the oracle states the
    * expected parts directly from the same source columns — the oracle
    * defines the CONTRACT, the Spark side must actually parse. All
    * string-exact, fully codegen'd.
    */
  def fnUrl(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.org/"),
          col("lang"), lit("/"), col("doc_id"), lit("?p="), col("n_chars"),
          lit("&s=1")))
      .select(col("doc_id"), col("url"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'p')").as("param_p"),
        expr("parse_url(url, 'PROTOCOL')").as("scheme"))
      .orderBy("doc_id")

  /** Spark 4 VARIANT path: `parse_json` → `variant_get` with typed
    * extraction — the semi-structured column type that replaces
    * string-JSON re-parsing per access (the variant is parsed ONCE into
    * a binary form; each field access is a binary probe, not a JSON
    * scan). Missing paths yield null, not an error. Oracle states the
    * same values via DuckDB json_extract.
    */
  def fnVariant(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("variant_get(parse_json(props), '$.k', 'bigint') * 2")
          .as("k_doubled"),
        expr("variant_get(parse_json(props), '$.absent', 'string')")
          .as("missing"))
      .orderBy("event_id")

  /** Error-safe function family: `try_cast` / `try_divide` return null
    * instead of failing the task — the difference between one malformed
    * row and a dead 100 TB job. All codegen'd.
    */
  def fnTry(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("try_cast(lang AS INT)").as("bad_int"),
        expr("try_cast(CAST(n_chars AS STRING) AS INT)").as("good_int"),
        expr("try_divide(n_chars, 0)").as("div0"),
        expr("try_divide(n_chars, 4)").as("div4"))
      .orderBy("doc_id")

  /** Interval / timestamp arithmetic family: literal-interval shifts,
    * `timestampdiff`/`timestampadd` unit arithmetic, `make_timestamp`
    * construction, and sub-day field extraction. All pure per-row codegen
    * (no shuffle); timestamps are emitted as formatted strings so the
    * gate compares text, not engine-local epoch encodings. The
    * minutes-since-midnight diff anchors on a minute-aligned truncation,
    * where boundary-count (DuckDB) and elapsed-floor (Spark) semantics
    * provably coincide.
    */
  def fnInterval(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        date_format(col("ts") + expr("INTERVAL 90 MINUTE"),
          "yyyy-MM-dd HH:mm:ss").as("plus90m"),
        date_format(col("ts") - expr("INTERVAL 1 DAY"),
          "yyyy-MM-dd HH:mm:ss").as("minus1d"),
        date_format(expr("timestampadd(HOUR, 6, ts)"),
          "yyyy-MM-dd HH:mm:ss").as("plus6h"),
        expr("timestampdiff(MINUTE, date_trunc('DAY', ts), ts)")
          .cast("long").as("min_of_day"),
        date_format(
          expr("make_timestamp(2024, 1, 15, hour(ts), minute(ts), 0)"),
          "yyyy-MM-dd HH:mm:ss").as("made"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("s"))
      .orderBy("event_id")

  /** Spark 4 collation-aware comparison: case-insensitive grouping and
    * equality through `collate(col, 'UTF8_LCASE')` — collation travels
    * WITH the type, so every downstream comparison/join/group on the
    * column is case-insensitive without wrapping each use in lower()
    * (and unlike lower(), collation preserves the original bytes).
    * Mixed-case input is synthesized deterministically from the row key;
    * output projects lower() of the representative so the result is
    * engine-stable, which is what the oracle (a lower()-based rewrite)
    * states.
    */
  def fnCollation(spark: SparkSession, dir: String): DataFrame = {
    val mixed = when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
      .otherwise(col("c_mktsegment"))
    Tables(spark, dir, "customer")
      .select(col("c_custkey"), mixed.as("seg_mixed"))
      .groupBy(collate(col("seg_mixed"), "UTF8_LCASE").as("k"))
      .agg(count(lit(1)).as("n"),
        count(when(expr(
          "seg_mixed = collate('building', 'UTF8_LCASE')"), 1))
          .as("n_eq_building"))
      .select(lower(col("k")).as("segment"), col("n"), col("n_eq_building"))
      .orderBy("segment")
  }

  /** Data masking: `mask()` preserves character CLASS structure (upper →
    * X, lower → x, digit → n) so masked values keep their format for
    * debugging/joins while destroying content — the complement of
    * `llm_pii_redact`'s pattern deletion. Custom replacement chars cover
    * the fourth (non-alnum) class too. Oracle: chained regexp_replace of
    * the same classes.
    */
  def fnMask(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        expr("mask(c_name)").as("masked_name"),
        expr("mask(c_mktsegment, 'Z', 'z', '9', '-')").as("masked_seg"),
        expr("mask(concat(c_mktsegment, '#', c_custkey))").as("masked_mix"))
      .orderBy("c_custkey")

  /** Map higher-order functions: transform_keys / transform_values /
    * map_filter / map_zip_with over a map built from row columns, each
    * result serialized to a `k=v,…` string (entry order = literal build
    * order, deterministic). The oracle reconstructs the same strings
    * directly from the columns — proving the map-HOF semantics without
    * needing map types in the oracle engine.
    */
  def fnMap2(spark: SparkSession, dir: String): DataFrame = {
    val m = map(lit("a"), col("n_chars"), lit("b"), col("doc_id"))
    def s(c: org.apache.spark.sql.Column) =
      concat_ws(",", transform(map_entries(c),
        e => concat(e.getField("key"), lit("="), e.getField("value"))))
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        s(transform_values(m, (_, v) => v * 2)).as("doubled"),
        s(map_filter(m, (k, _) => k === "a")).as("only_a"),
        s(transform_keys(m, (k, _) => upper(k))).as("upper_keys"),
        s(map_zip_with(m, transform_values(m, (_, v) => v * 2),
          (_, v1, v2) => v1 + v2)).as("zipped"),
        element_at(m, "b").as("b_val"))
      .orderBy("doc_id")
  }

  /** Binary encodings: base64 round-trip, hex (lowercased — Spark emits
    * uppercase, DuckDB lowercase), SHA-256, and byte lengths. The
    * round-trip column (`decode(unbase64(base64(x)))`) proves both
    * directions engine-side. Spark 4.1's base64 still emits the MIME
    * 76-char `\r\n` chunking (measured — the non-chunked default did not
    * land here), so the emitted column strips the line breaks to the
    * canonical form; unbase64 accepts either.
    */
  def fnEncode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_replace(base64(col("text").cast("binary")), "\r\n", "")
          .as("b64"),
        decode(unbase64(base64(col("text").cast("binary"))), "UTF-8")
          .as("roundtrip"),
        lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("hex8"),
        sha2(col("text"), 256).as("sha256_hex"),
        length(col("text").cast("binary")).as("n_bytes"),
        bit_length(col("text")).as("n_bits"))
      .orderBy("doc_id")

  /** `aggregate()` higher-order fold with a STRUCT accumulator — the
    * general per-row reduction (beyond transform/filter/zip_with): one
    * pass over the token array accumulates (char_sum, count), the finish
    * lambda emits the derived mean. All integers until one exact final
    * division, so the fold is cross-engine exact. HOF lambdas are
    * interpreted (the bm25 lesson) — fine here because the op IS the
    * per-element work, not a derived column beside codegen'd ones.
    */
  def fnAggregateHof(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("w", split(col("text"), " "))
      .withColumn("acc", expr(
        "aggregate(w, named_struct('c', 0L, 'n', 0L), " +
          "(acc, x) -> named_struct('c', acc.c + length(x), 'n', acc.n + 1), " +
          "acc -> named_struct('c', acc.c, 'n', acc.n, " +
          "'avg', CAST(acc.c AS DOUBLE) / acc.n))"))
      .select(col("doc_id"), col("acc.c").as("sum_chars"),
        col("acc.n").as("n_words"), col("acc.avg").as("avg_len"))
      .orderBy("doc_id")

  /** Named-zone timestamp conversion (`to_utc_timestamp` /
    * `from_utc_timestamp` with an IANA zone): wall-clock ↔ instant in
    * America/New_York, plus the local hour — the everyday ETL need the
    * session-UTC policy (§5) otherwise hides. Outputs are epoch-µs
    * BIGINTs: session-timezone-independent on both engines (the DuckDB
    * oracle builds its instants via to_timestamp(epoch), never a
    * session-tz-dependent cast).
    */
  def fnTimezone(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(to_utc_timestamp(col("ts"), "America/New_York"))
          .as("as_ny_wall_us"),
        unix_micros(from_utc_timestamp(col("ts"), "America/New_York"))
          .as("ny_local_us"),
        hour(from_utc_timestamp(col("ts"), "America/New_York"))
          .as("ny_hour"))
      .orderBy("event_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_timezone" -> fnTimezone,
    "fn_aggregate_hof" -> fnAggregateHof,
    "fn_encode" -> fnEncode,
    "fn_map2" -> fnMap2,
    "fn_mask" -> fnMask,
    "fn_collation" -> fnCollation,
    "fn_interval" -> fnInterval,
    "fn_try" -> fnTry,
    "fn_variant" -> fnVariant,
    "fn_url" -> fnUrl,
    "fn_hash" -> fnHash,
    "fn_struct" -> fnStruct,
    "fn_regexp" -> fnRegexp,
    "fn_string2" -> fnString2,
    "fn_date2" -> fnDate2,
    "fn_bitwise" -> fnBitwise,
    "fn_string" -> fnString,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_cond" -> fnCond,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
    "fn_explode" -> fnExplode
  )

  def oracle: Map[String, String] = Map(
    "fn_timezone" ->
      ("SELECT event_id, epoch_us(ts) AS ts_us, " +
        // wall-clock in NY → absolute instant
        "epoch_us(timezone('America/New_York', " +
        "make_timestamp(epoch_us(ts)))) AS as_ny_wall_us, " +
        // absolute instant → NY wall-clock
        "epoch_us(timezone('America/New_York', " +
        "to_timestamp(epoch_us(ts) / 1000000.0))) AS ny_local_us, " +
        "CAST(hour(timezone('America/New_York', " +
        "to_timestamp(epoch_us(ts) / 1000000.0))) AS INT) AS ny_hour " +
        "FROM events ORDER BY event_id"),
    // closed form: tokens are single-space separated, so Σ word lengths
    // = len(text) - (n_words - 1)
    "fn_aggregate_hof" ->
      ("WITH d AS (SELECT doc_id, len(text) AS lc, " +
        "len(string_split(text, ' ')) AS n FROM documents) " +
        "SELECT doc_id, CAST(lc - (n - 1) AS BIGINT) AS sum_chars, " +
        "CAST(n AS BIGINT) AS n_words, " +
        "CAST(lc - (n - 1) AS DOUBLE) / n AS avg_len " +
        "FROM d ORDER BY doc_id"),
    "fn_encode" ->
      ("SELECT doc_id, base64(encode(text)) AS b64, text AS roundtrip, " +
        "lower(hex(encode(substring(text, 1, 8)))) AS hex8, " +
        "sha256(text) AS sha256_hex, " +
        "octet_length(encode(text)) AS n_bytes, " +
        "8 * octet_length(encode(text)) AS n_bits " +
        "FROM documents ORDER BY doc_id"),
    "fn_map2" ->
      ("SELECT doc_id, " +
        "'a=' || (n_chars * 2) || ',b=' || (doc_id * 2) AS doubled, " +
        "'a=' || n_chars AS only_a, " +
        "'A=' || n_chars || ',B=' || doc_id AS upper_keys, " +
        "'a=' || (n_chars * 3) || ',b=' || (doc_id * 3) AS zipped, " +
        "doc_id AS b_val " +
        "FROM documents ORDER BY doc_id"),
    "fn_mask" ->
      ("SELECT c_custkey, " +
        "regexp_replace(regexp_replace(regexp_replace(c_name, " +
        "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') " +
        "AS masked_name, " +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "c_mktsegment, '[A-Z]', 'Z', 'g'), '[a-z]', 'z', 'g'), " +
        "'[0-9]', '9', 'g'), '[^Zz9]', '-', 'g') AS masked_seg, " +
        "regexp_replace(regexp_replace(regexp_replace(" +
        "c_mktsegment || '#' || c_custkey, " +
        "'[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') " +
        "AS masked_mix " +
        "FROM customer ORDER BY c_custkey"),
    "fn_collation" ->
      ("SELECT lower(seg_mixed) AS segment, count(*) AS n, " +
        "count(CASE WHEN lower(seg_mixed) = 'building' THEN 1 END) " +
        "AS n_eq_building " +
        "FROM (SELECT CASE WHEN c_custkey % 2 = 0 " +
        "THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg_mixed " +
        "FROM customer) GROUP BY 1 ORDER BY 1"),
    "fn_interval" ->
      ("SELECT event_id, " +
        "strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus90m, " +
        "strftime(ts - INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS minus1d, " +
        "strftime(ts + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS plus6h, " +
        "CAST(date_diff('minute', date_trunc('day', ts), ts) AS BIGINT) " +
        "AS min_of_day, " +
        "strftime(make_timestamp(2024, 1, 15, hour(ts), minute(ts), 0), " +
        "'%Y-%m-%d %H:%M:%S') AS made, " +
        "CAST(hour(ts) AS BIGINT) AS h, " +
        "CAST(minute(ts) AS BIGINT) AS mi, " +
        "CAST(second(ts) AS BIGINT) AS s " +
        "FROM events ORDER BY event_id"),
    "fn_try" ->
      ("SELECT doc_id, TRY_CAST(lang AS INT) AS bad_int, " +
        "TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS good_int, " +
        "CAST(NULL AS DOUBLE) AS div0, " +
        "n_chars / 4 AS div4 " +
        "FROM documents ORDER BY doc_id"),
    "fn_variant" ->
      ("SELECT event_id, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) AS k, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled, " +
        "CAST(NULL AS VARCHAR) AS missing " +
        "FROM events ORDER BY event_id"),
    "fn_url" ->
      ("SELECT doc_id, 'https://' || source || '.example.org/' || lang || " +
        "'/' || CAST(doc_id AS VARCHAR) || '?p=' || CAST(n_chars AS VARCHAR) " +
        "|| '&s=1' AS url, " +
        "source || '.example.org' AS host, " +
        "'/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path, " +
        "'p=' || CAST(n_chars AS VARCHAR) || '&s=1' AS query, " +
        "CAST(n_chars AS VARCHAR) AS param_p, " +
        "'https' AS scheme " +
        "FROM documents ORDER BY doc_id"),
    "fn_hash" ->
      ("SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256, " +
        "to_base64(CAST(c_name AS BLOB)) AS b64, hex(c_name) AS hx " +
        "FROM customer ORDER BY c_custkey"),
    "fn_struct" ->
      ("SELECT o_orderkey, " +
        "struct_extract(struct_pack(st := o_orderstatus, k := o_orderkey, " +
        "p := o_totalprice), 'st') AS st, " +
        "struct_extract(struct_pack(st := o_orderstatus, k := o_orderkey, " +
        "p := o_totalprice), 'p') * 2 AS p2, " +
        "to_json(struct_pack(s := o_orderstatus, k := o_orderkey)) AS js " +
        "FROM orders ORDER BY o_orderkey"),
    "fn_regexp" ->
      ("SELECT p_partkey, " +
        "array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words, " +
        "CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels, " +
        "regexp_extract(p_name, '^(\\w+) (\\w+)', 2) AS second_word " +
        "FROM part WHERE regexp_matches(p_name, '^[a-z]+ ') " +
        "ORDER BY p_partkey"),
    "fn_string2" ->
      ("SELECT p_partkey, " +
        "regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num, " +
        "translate(p_name, 'aeiou', '12345') AS tr, " +
        "repeat(p_brand, 2) AS rep2, " +
        "left(p_name, 3) AS l3, right(p_name, 3) AS r3, " +
        "contains(p_name, 'gear') AS has_gear, " +
        "md5(p_name) AS name_md5 " +
        "FROM part ORDER BY p_partkey"),
    "fn_date2" ->
      ("SELECT o_orderkey, " +
        "CAST(weekofyear(o_orderdate) AS BIGINT) AS woy, " +
        "CAST(quarter(o_orderdate) AS BIGINT) AS q, " +
        "CAST(dayofyear(o_orderdate) AS BIGINT) AS doy, " +
        "strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m, " +
        "epoch_us(o_orderdate) // 1000000 AS epoch_s " +
        "FROM orders ORDER BY o_orderkey"),
    "fn_bitwise" ->
      ("SELECT o_orderkey, o_orderkey & 255 AS band, " +
        "o_orderkey | 16 AS bor, xor(o_orderkey, 255) AS bxor, " +
        "o_orderkey << 2 AS shl, o_orderkey >> 1 AS shr " +
        "FROM orders ORDER BY o_orderkey"),
    "fn_string" ->
      ("SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, " +
        "substring(p_name, 1, 5) AS sub, " +
        "concat_ws('|', p_brand, p_type) AS cw, " +
        "CAST(length(p_name) AS BIGINT) AS len, " +
        "replace(p_name, ' ', '_') AS rep, " +
        "lpad(p_type, 10, '.') AS lp, " +
        "CAST(instr(p_name, 'e') AS BIGINT) AS pos_e, " +
        "string_split(p_name, ' ')[1] AS first_word, " +
        "trim('  ' || p_brand || '  ') AS trimmed " +
        "FROM part ORDER BY p_partkey"),
    "fn_date" ->
      ("SELECT o_orderkey, " +
        "CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(day(o_orderdate) AS BIGINT) AS d, " +
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start, " +
        "strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30, " +
        "CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k, " +
        "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom, " +
        "CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow " +
        "FROM orders ORDER BY o_orderkey"),
    "fn_math" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "round(l_extendedprice, 0) AS r0, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS fl, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS ce, " +
        "abs(l_discount - 0.05) AS ab, " +
        "pow(l_quantity, 2) AS p2, " +
        "sqrt(l_quantity) AS sq, " +
        "round(ln(l_extendedprice), 6) AS ln6, " +
        "greatest(l_quantity, l_discount * 100) AS gr, " +
        "least(l_quantity, l_tax * 100) AS le, " +
        "CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg, " +
        "l_orderkey % 7 AS m7, " +
        "l_orderkey // 7 AS d7 " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "fn_cond" ->
      ("SELECT c_custkey, " +
        "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' " +
        "ELSE 'high' END AS bal_band, " +
        "CAST(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS BIGINT) AS is_building, " +
        "coalesce(nullif(c_mktsegment, 'MACHINERY'), 'machines') AS seg_repl, " +
        "CAST(c_custkey AS DOUBLE) AS key_dbl, " +
        "CAST(c_custkey AS VARCHAR) AS key_str " +
        "FROM customer ORDER BY c_custkey"),
    "fn_array" ->
      ("SELECT vec_id, " +
        "CAST(len(embedding) AS BIGINT) AS dim, " +
        "embedding[1] AS first_val, " +
        "embedding[4] AS head4_last, " +
        "list_max(embedding) AS maxv, " +
        "list_sort(embedding[1:4])[1] AS sorted_min, " +
        "list_contains(range(1, CAST(label AS BIGINT) + 3), 3) AS has3, " +
        "array_to_string(range(1, CAST(label AS BIGINT) + 3), ',') AS ints_s, " +
        "array_to_string(list_transform(range(1, CAST(label AS BIGINT) + 3), x -> x * x), ',') AS squares_s, " +
        "array_to_string(list_filter(range(1, CAST(label AS BIGINT) + 3), x -> x % 2 = 0), ',') AS evens_s, " +
        "CAST(list_sum(range(1, CAST(label AS BIGINT) + 3)) AS BIGINT) AS total " +
        "FROM embeddings ORDER BY vec_id"),
    "fn_map" ->
      ("SELECT event_id, array_to_string(json_keys(props), ',') AS ks, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) AS kv, " +
        "event_type AS mv " +
        "FROM events ORDER BY event_id"),
    "fn_json" ->
      ("SELECT event_id, " +
        "json_extract_string(props, '$.k') AS jk, " +
        "CAST(to_json(struct_pack(event_id := event_id, event_type := event_type)) AS VARCHAR) AS js, " +
        "'STRUCT<k: BIGINT>' AS sch, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) AS parsed_k " +
        "FROM events ORDER BY event_id"),
    "fn_explode" ->
      ("SELECT doc_id, s.pos - 1 AS pos, s.w AS word FROM " +
        "(SELECT doc_id, unnest(list_transform(string_split(text, ' '), " +
        "(x, i) -> struct_pack(pos := i, w := x))) AS s FROM documents) " +
        "ORDER BY doc_id, pos")
  )
}
