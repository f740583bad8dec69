package graft

import org.apache.spark.sql.SparkSession

/** The ONE place graft sessions are configured. Verify, Bench, the test
  * base, and every dev probe build through here, so no entry point can
  * drift on a conf the operators depend on (the r7 advisor found Bench
  * missing the UTC pin that the events TIMESTAMP_NTZ cast needs — a
  * class of bug this object removes).
  *
  * Confs carried by every session:
  *  - `session.timeZone=UTC`: the events reader casts NTZ→Timestamp
  *    (session-tz-sensitive) and all date arithmetic must match the
  *    DuckDB oracle's naive-UTC semantics.
  *  - `legacy.parquet.nanosAsLong=true`: the events fixture has been
  *    TIMESTAMP(NANOS) in past driver regens; the flag is harmless for
  *    non-NANOS files. It lives HERE, not in the reader — a table
  *    reader silently flipping session-wide legacy conf was the r7
  *    verdict's footgun; [[Tables.apply]] now asserts instead of sets.
  *  - `shuffle.partitions` = local core count (not 200) — fixture-sized;
  *    production sizing lives in [[graft.plans.Tuning]].
  *  - v2 bucketing on: join_storage_partitioned needs it, and setting it
  *    per-key would mean keys execute under configs they weren't
  *    validated with (advisor round-4 consistent-config note).
  */
object Sessions {

  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // the GVT SQL catalog: CREATE TABLE gvt.t / INSERT INTO gvt.t /
      // SELECT ... FROM gvt.`/abs/path` (r12)
      .config("spark.sql.catalog.gvt", "graft.sources.GvtCatalog")
      .config("spark.sql.catalog.gvt.warehouse",
        s"${System.getProperty("java.io.tmpdir")}/gvt-warehouse")
      // codegen class cache sized for the whole 305-key suite (static
      // conf, default 100 entries): with only 100, a suite-wide pass
      // evicts every earlier key's generated classes, so the r17
      // pass-separated bench reps re-Janino + re-JIT each key on BOTH
      // passes (~2x on codegen-heavy keys, measured). ~8 units/key x
      // 305 keys fits comfortably; entries are bytecode+classloader,
      // a few hundred MB ceiling against the 8 GB heap. Production
      // jobs with many distinct plans want the same.
      .config("spark.sql.codegen.cache.maxEntries", "4096")

  /** Build + log level + graft optimizer rules installed ONCE at
    * construction, so no query key mutates the shared session mid-run
    * and every key is validated under the same planner config.
    */
  def local(cpus: String, logLevel: String = "WARN"): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    install(s)
    s
  }

  /** [[builder]] plus data-derived AQE initial shuffle width for a known
    * fixture dir ([[plans.Tuning.widthFor]]): identical to `builder` at
    * fixture SFs (the floor = core count wins), replica-sized on the
    * ×10/×100 dirs so big runs stop spilling without anyone touching a
    * knob.
    */
  def builderFor(cpus: String, sfDir: String): SparkSession.Builder = {
    val width = plans.Tuning.widthFor(sfDir, cpus.toInt)
    // initialPartitionNum alone is NOT enough: AQE's parallelism-first
    // coalescing targets total/minPartitionNum bytes per task
    // (minPartitionNum defaults to the core count), which merged the
    // ×100 replica's 1.2 GB shuffles right back to 32 ~37 MB tasks and
    // kept the spill (measured, r8). Raising minPartitionNum to the same
    // derived width makes the coalesce target total/width — tiny stages
    // still collapse (the 1 MB minPartitionSize floor wins there), big
    // ones keep their width.
    //
    // FIXTURE SCALE GETS NO OVERRIDE AT ALL: when the derived width is
    // just the core-count floor, pinning minPartitionNum to it forbids
    // AQE from coalescing tiny stages below `cores` partitions — pure
    // per-task overhead on multi-stage keys at sf0.1 (measured:
    // llm_dedup_near 1.04 → ~1.7 s in the r8 bench profile, recovered
    // by this guard). The overrides exist for replica/production dirs
    // where width > cores, which is exactly when they engage.
    val b = builder(cpus)
    if (width > cpus.toInt)
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          width.toString)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
          width.toString)
    else b
  }

  /** The dev probes' shared A-B hook: SPARK_GRAFT_RULE_OFF=Name[,Name]
    * drops the named rules from `experimental.extraOptimizations` for a
    * control run (substring match on ruleName). One definition so the
    * matching semantics cannot drift between probes. */
  def applyRuleOff(spark: org.apache.spark.sql.SparkSession): Unit =
    for (names <- sys.env.get("SPARK_GRAFT_RULE_OFF")) {
      val off = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
      val ex = spark.experimental
      ex.extraOptimizations = ex.extraOptimizations
        .filterNot(r => off.exists(r.ruleName.contains))
      println(s"RULE_OFF $off -> ${ex.extraOptimizations.map(_.ruleName)}")
    }

  def localFor(cpus: String, sfDir: String,
      logLevel: String = "WARN"): SparkSession = {
    val s = builderFor(cpus, sfDir).getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    install(s)
    s
  }

  /** Install the graft extraOptimizations + strategies (idempotent).
    * These must ride `experimental.extraOptimizations` (the
    * "User Provided Optimizers" batch at the END of the optimizer):
    * `injectOptimizerRule`'s slot runs inside the operator-optimization
    * batch, BEFORE RewritePredicateSubquery has turned EXISTS/NOT EXISTS
    * into the LeftSemi/LeftAnti joins that [[plans.RewriteExistsOther]]
    * matches.
    */
  def install(spark: SparkSession): Unit = {
    plans.TopK.installRewrite(spark)
    plans.RewriteExistsOther.install(spark)
    plans.MaterializedViews.install(spark)
    plans.RewriteCohortScalar.install(spark)
    // SQL UPDATE / MERGE INTO on gvt tables: DataSourceV2Strategy only
    // refuses these at PHYSICAL planning, so this optimizer-slot
    // rewrite lowers them onto the Gvt API first (r12)
    val ex = spark.experimental
    if (!ex.extraOptimizations.exists(_ eq sources.RewriteGvtDml))
      ex.extraOptimizations = ex.extraOptimizations :+ sources.RewriteGvtDml
  }
}
