package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shared conf set via Sessions — the r7 advisor caught this builder
    // missing the UTC pin the events TIMESTAMP_NTZ cast depends on
    val spark = Sessions.localFor(cpus, sfDir)
    // Steady-state warm-up (JVM/codegen/parquet-reader pools), matching
    // the warm-cache conditions of the BASELINE.md oracle measurements;
    // not counted in any query's time.
    try {
      spark.range(1 << 20)
        .groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
        .count().count()
      SparkEntry.entry(spark).count()
      // first collation use loads the ICU collator classes (~1.2 s,
      // measured) — a one-time JVM cost, warmed like codegen above so
      // fn_collation's number reflects the operator, not class loading
      spark.sql("SELECT collate('a', 'UTF8_LCASE') = 'A'").collect()
    } catch { case _: Throwable => () }
    // Two timed repetitions per query, report the MIN: single-shot numbers
    // on this shared box swing ±30-40% with machine contention (r2 driver
    // total 84.7 s vs 55.9 s same-code re-measure; r3 flagged 3 "regressions"
    // that were load noise). The min of two runs is the contention-robust
    // estimator of the plan's actual cost; plan pathologies (the thing the
    // bench exists to catch) survive both reps.
    // Contention gate (r7 verdict #7): the driver's r7 bench artifact
    // (419 s at loadavg 11.8 vs the committed 84 s quiet-machine profile)
    // was pure machine noise. When the box is already busy at start, a
    // min-of-2 is not enough — run a THIRD rep so the minimum has more
    // chances to land in a quiet window, and flag the run as contended
    // in the JSON line so downstream comparisons know to distrust it.
    val loadAvgStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val contended = loadAvgStart > cpus.toInt / 4.0
    val baseReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val reps = if (contended) math.max(baseReps, 3) else baseReps
    // Failure-honest timing (r4 verdict #3): a rep that throws records NO
    // time — previously `catch { -1L }` let a broken query bench as a fast
    // success. A key with zero successful reps lands in `errors`, is
    // excluded from every total, and its name is emitted in the JSON line
    // so the bench cannot silently lie about a crashing query.
    // Dev-only subset filter, mirroring Verify's: the driver never sets
    // this; locally it turns plan iteration on one key into seconds.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(keys) => SparkEntry.queries.view.filterKeys(keys).toMap
      case None => SparkEntry.queries
    }
    // Per-key loadavg sampling (r14 verdict #6): the r14 driver run
    // self-reported contended:false off the START loadavg while its own
    // fields showed 3.81 → 7.67 across the run — contention that BEGINS
    // mid-run was invisible to the flag. One getSystemLoadAverage call
    // per key (~µs) gives the series for the artifact; but loadavg
    // alone CANNOT be the mid-run flag: the bench's own local[N] work
    // drives loadavg to several on a perfectly quiet box (measured
    // 4.65 max on an idle one — a loadavg-max flag false-positives on
    // every real run). The flag's mid-run signal is therefore the
    // EXTERNAL CPU share: Δ(/proc/stat busy) − Δ(own process CPU) over
    // the run, as a fraction of total capacity — self-load subtracts
    // itself out exactly, foreign spinners/writers do not.
    def loadNow = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadSamples = scala.collection.mutable.ArrayBuffer(loadAvgStart)
    val nCores = Runtime.getRuntime.availableProcessors()
    // (total busy jiffies across all cpus, own process cpu ns, iowait
    // jiffies); -1 when /proc or the com.sun bean is unavailable
    // (non-Linux fallback: the flag keys off the start loadavg alone,
    // as before r15)
    def cpuStats(): (Long, Long, Long) =
      try {
        val cols = scala.io.Source.fromFile("/proc/stat").getLines()
          .next().trim.split("\\s+").drop(1).map(_.toLong)
        // user nice system idle iowait irq softirq steal — busy is
        // everything except idle(3) and iowait(4). Only the first 8
        // columns count (ADVICE r15): guest/guest_nice (cols 8-9) are
        // already folded into user/nice by the kernel, so including
        // them double-counts guest CPU on VM hosts and can spuriously
        // flip contended:true.
        val busy = cols.take(8).zipWithIndex
          .collect { case (v, i) if i != 3 && i != 4 => v }.sum
        val self = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
          .getProcessCpuTime
        // iowait (col 4): CPUs idle with runnable IO pending. The r16
        // driver bench started at loadavg 3.55 while the external-CPU
        // share read 0.003 — foreign D-state IO load is INVISIBLE to
        // the busy-jiffy instrument (iowait is excluded from busy by
        // construction) yet stalls this suite's shuffle/checkpoint/
        // staging writes hard. Recorded as a confound marker only: the
        // bench's own GVT staging writes also raise iowait, so unlike
        // the CPU share, self cannot be subtracted out and the value
        // cannot decide the contended label by itself.
        (busy, self, cols(4))
      } catch { case scala.util.control.NonFatal(_) => (-1L, -1L, -1L) }
    val (busy0, self0, io0) = cpuStats()
    val wall0 = System.nanoTime()
    // Per-key cpuStats samples (r15 verdict #5 / ADVICE): the whole-run
    // external share DILUTES a transient foreign burst (a spinner alive
    // for 40% of the run reads 0.10 < 0.125 and mislabels the run
    // quiet). One /proc/stat read + one bean call per key (~µs) gives
    // boundary samples; consecutive key windows are merged into ≥1 s
    // segments (jiffy resolution is 10 ms — a 50 ms key window would
    // read 1 stray kworker tick as a 50% share) and the flag keys off
    // the MAX segment share, so a burst covering any one window flips
    // it even when the run-wide average stays under the threshold.
    val cpuSamples = scala.collection.mutable.ArrayBuffer(
      (busy0, self0, io0, wall0))
    // Reps run as SUITE PASSES (r17 measurement fix): all keys once, then
    // the whole suite again, min across passes. The old per-key
    // back-to-back reps put both timings of a key inside the SAME
    // ~seconds-wide wall-clock window, so one transient ambient stall
    // (foreign IO writeback, cgroup reclaim) polluted BOTH reps of every
    // key it covered and min-of-2 was no protection — the r16 driver
    // bench read llm_dedup_ngram_jaccard at 20.1 s on both reps while
    // the same HEAD measured 1.1 s elsewhere, and every damaged key sat
    // in run positions 1-49 (one contiguous early time window; late keys
    // were clean). With passes separated by the full suite length
    // (~1-2 min), a stall shorter than a pass can cover each key at most
    // once and the min recovers the true cost. Timed action, key set,
    // rep count and the JSON contract are unchanged.
    val keySeq = selected.toSeq
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      keySeq.map { case (k, _) => k -> Vector.empty[Double] }: _*)
    (1 to reps).foreach { _ =>
      keySeq.foreach { case (name, fn) =>
        loadSamples += loadNow
        val (b, s, io) = cpuStats()
        cpuSamples += ((b, s, io, System.nanoTime()))
        val t0 = System.nanoTime()
        // NonFatal only (Verify's pattern): an OOM/StackOverflow must
        // kill the run — timings taken in a post-OOM JVM are noise that
        // would be committed as the round's profile
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case scala.util.control.NonFatal(_) => false }
        if (ok) acc(name) = acc(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val raw = acc.toSeq
    val errorKeys = raw.collect { case (n, ts) if ts.isEmpty => n }.sorted
    // min = contention-robust plan-cost estimate; max kept alongside so
    // first-run costs (shuffle/file staging, codegen) stay visible and
    // pre-reps single-shot totals remain comparable (advisor round-4 note).
    val results = raw.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }.toMap
    val resultsMax = raw.collect { case (n, ts) if ts.nonEmpty => n -> ts.max }.toMap
    // The emitted JSON must stay ONE SHORT line: the driver captures only
    // a bounded output tail, and a per-query dict over the full ~90-key
    // suite overflows it (round 1's bench recorded parsed:null). Headline
    // queries only in "queries"; "value" is still the full-suite total.
    val headline = Seq(
      "agg_hash_group", "agg_distinct", "join_multiway", "join_broadcast",
      "win_rank_topn", "limit_topk", "scan_parquet", "stream_tumbling",
      "etl_noaa_daily", "llm_dedup_near", "llm_dedup_ngram_jaccard",
      "llm_sim_cosine", "llm_text_tfidf", "sort_multi", "plan_topk_native",
      "join_storage_partitioned", "llm_knn_join", "llm_repetition_filter")
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale (de_DE etc.) would emit invalid JSON.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = headline.flatMap(k => results.get(k).map(v =>
      "\"" + k + "\":" + fmt(v))).mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalMax = if (resultsMax.nonEmpty) resultsMax.values.sum else 0.0
    val errsJson = errorKeys.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Full per-query timings ALWAYS go to a FILE, never stdout — stdout
    // carries only the one bounded JSON line the driver parses (a
    // 237-key dict overflows the driver's captured tail; round 1
    // recorded parsed:null that way). The r5 verdict's auditability gap
    // (only 18/237 per-key times visible round-over-round) is closed by
    // writing the full [min,max] profile unconditionally to a stable
    // repo path and naming that path in the JSON line; round-close
    // commits a BENCH_FULL_r{N}.json snapshot so every key is diffable
    // across rounds without env vars.
    // cwd-relative default (advisor r6): an absolute /root/repo path broke
    // any other checkout location, and with the old silent catch the
    // profile would just never be written there.
    // A SPARK_GRAFT_ONLY subset must never clobber the committed full
    // profile with a partial one — park it in the temp dir instead.
    val fullPath = sys.env.get("SPARK_GRAFT_BENCH_FULL").getOrElse(
      if (only.isDefined)
        new java.io.File(System.getProperty("java.io.tmpdir"),
          "BENCH_SUBSET_latest.json").getAbsolutePath
      else new java.io.File("BENCH_FULL_latest.json").getAbsolutePath)
    // "_"-prefixed meta entries lead the profile (round_close.py and
    // any per-key consumer skip them): the loadavg sample series and
    // the external-CPU share, both recorded end-of-run BEFORE
    // serializing so the artifact carries exactly what the flag saw.
    val loadAvg = loadNow
    loadSamples += loadAvg
    val (busy1, self1, io1) = cpuStats()
    cpuSamples += ((busy1, self1, io1, System.nanoTime()))
    val externalUtil =
      if (busy0 < 0 || busy1 < 0) -1.0
      else {
        val wallSec = (System.nanoTime() - wall0) / 1e9
        // /proc/stat jiffies are USER_HZ = 100/s on linux
        val extSec = (busy1 - busy0) / 100.0 - (self1 - self0) / 1e9
        math.max(0.0, extSec / (wallSec * nCores))
      }
    // run-wide iowait share of capacity (confound marker, see cpuStats)
    val ioUtil =
      if (io0 < 0 || io1 < 0) -1.0
      else {
        val wallSec = (System.nanoTime() - wall0) / 1e9
        math.max(0.0, ((io1 - io0) / 100.0) / (wallSec * nCores))
      }
    // windowed external + iowait shares: fold the per-key boundary
    // samples into consecutive segments of ≥ 1 s wall each (greedy merge
    // — short key windows accumulate until the segment is long enough
    // for jiffy resolution to be meaningful), then the share per segment.
    val (extWindows, ioWindows): (Seq[Double], Seq[Double]) =
      if (busy0 < 0 || busy1 < 0) (Nil, Nil)
      else {
        val segs = scala.collection.mutable.ArrayBuffer.empty[Double]
        val ioSegs = scala.collection.mutable.ArrayBuffer.empty[Double]
        var (pb, ps, pio, pw) = cpuSamples.head
        def close(b: Long, s: Long, io: Long, w: Long): Unit = {
          val wallSec = (w - pw) / 1e9
          val extSec = (b - pb) / 100.0 - (s - ps) / 1e9
          segs += math.max(0.0, extSec / (wallSec * nCores))
          ioSegs += math.max(0.0, ((io - pio) / 100.0) / (wallSec * nCores))
          pb = b; ps = s; pio = io; pw = w
        }
        cpuSamples.tail.foreach { case (b, s, io, w) =>
          if (b >= 0 && w - pw >= 1000000000L) close(b, s, io, w)
        }
        // the sub-1s tail after the last closed segment still gets a
        // window (≥200 ms — 20 jiffies — keeps it meaningful) so a
        // burst overlapping only the run's end is not silently dropped
        val (lb, ls, lio, lw) = cpuSamples.last
        if (lb >= 0 && lw - pw >= 200000000L) close(lb, ls, lio, lw)
        (segs.toSeq, ioSegs.toSeq)
      }
    val extUtilMax =
      if (extWindows.isEmpty) externalUtil else extWindows.max
    val ioUtilMax = if (ioWindows.isEmpty) ioUtil else ioWindows.max
    val full = (Seq(
      "\"_loadavg\":" + loadSamples.map(fmt).mkString("[", ",", "]"),
      "\"_external_util\":" + fmt(externalUtil),
      "\"_external_util_max\":" + fmt(extUtilMax),
      "\"_external_util_windows\":" +
        extWindows.map(fmt).mkString("[", ",", "]"),
      "\"_io_util\":" + fmt(ioUtil),
      "\"_io_util_max\":" + fmt(ioUtilMax),
      "\"_io_util_windows\":" +
        ioWindows.map(fmt).mkString("[", ",", "]"))
      ++ results.toSeq.sortBy(-_._2).map { case (k, v) =>
        "\"" + k + "\":[" + fmt(v) + "," + fmt(resultsMax(k)) + "]"
      }).mkString("{", ",", "}")
    // On write failure, advertise full_profile:null instead of naming a
    // path that now holds stale previous-round data (advisor r6 — a
    // silent failure there would make cross-round diffs compare wrong
    // numbers while claiming auditability).
    val fullWritten =
      try { java.nio.file.Files.writeString(
              java.nio.file.Paths.get(fullPath), full); true }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] full-profile write failed: $e"); false }
    // JSON-escape env-controlled strings (advisor r6): a quote or
    // backslash in the path/sfDir would otherwise emit invalid JSON and
    // the driver would record parsed:null. Shared escaper (graft.Json)
    // — Verify writes its manifests through the same one.
    def jstr(s: String): String = Json.str(s)
    val fullField = if (fullWritten) jstr(fullPath) else "null"
    // 1-minute system load average at measurement end: BENCH_r06's 2-5×
    // "regression" was pure machine contention (judge re-measured idle),
    // so the artifact now carries its own confound marker — a loadavg
    // far above the core count means the totals are noise, not plans.
    // -1.0 where the platform doesn't support it.
    // the mid-run flag (r15): external CPU share over the run — total
    // busy minus our own process, over capacity. Self-load cancels
    // exactly, so a quiet run reads ~0 even while the bench saturates
    // the box, and the r14 mislabel (foreign load starting mid-run,
    // contended:false off the start sample) reads true. 12.5% of the
    // box (4 cores here) is the threshold — writeback kworkers measure
    // ~1%, one foreign builder measures well above. The rep bump above
    // still keys off the start sample only: reps can't be raised
    // retroactively once keys have run. loadavg series stays in the
    // artifact for cross-checking, but never decides the flag.
    val loadAvgMax = loadSamples.max
    // the flag keys off the run average AND the max ≥1 s window (r16):
    // a burst covering one window flips it even when the average
    // dilutes below threshold; quiet runs measure 0.000-0.010 on both.
    // The START-loadavg heuristic no longer feeds the LABEL (it still
    // picks the rep count above, where being conservative is free):
    // it cannot separate self from foreign load, and the launcher's
    // own startup (sbt compile check + session init + warmup) pushes
    // the 1-min loadavg past the threshold on a genuinely idle box —
    // the same self-load false positive the external-share instrument
    // was built to remove. Foreign load that is present at start and
    // persists into the run IS caught (it reads as external share in
    // the windows); foreign load that ends before the first timed key
    // doesn't pollute the timings it no longer overlaps. The legacy
    // heuristic remains the label only where /proc/stat is
    // unavailable and the shares read -1.
    val contendedRun =
      if (externalUtil < 0) contended
      else externalUtil > 0.125 || extUtilMax > 0.125
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_max":${fmt(totalMax)},"n_queries":${results.size},"errors":${errorKeys.size},"error_keys":$errsJson,"reps":$reps,"contended":$contendedRun,"external_util":${fmt(externalUtil)},"external_util_max":${fmt(extUtilMax)},"io_util":${fmt(ioUtil)},"io_util_max":${fmt(ioUtilMax)},"loadavg_start":${fmt(loadAvgStart)},"loadavg":${fmt(loadAvg)},"loadavg_max":${fmt(loadAvgMax)},"full_profile":$fullField,"queries":$qs,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
