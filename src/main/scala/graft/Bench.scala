package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Per-query hygiene so one query's leftovers never bill the next:
    * leftover streaming queries keep state-store maintenance threads alive
    * (round-1: q37's state store inflated every query after it in the
    * recorded run), cached plans/temp views accumulate driver memory, and
    * session-conf mutations (e.g. the sampling operators' raise-only
    * `windowGroupLimitThreshold`) would otherwise make every later query
    * plan under whatever conf the earlier ones left behind — the round-12
    * q82/q117 "unexplained elevation" suspect. `baseConf` is the pristine
    * post-warmup conf; every key that drifted is restored (new keys
    * unset), so each query PLANS against the same session state
    * regardless of its position in the run. Restoring after the action
    * completes is safe here because bench queries never recompose a
    * previous query's frame.
    */
  private def hygiene(spark: SparkSession, baseConf: Map[String, String]): Unit = {
    spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => })
    try spark.catalog.clearCache() catch { case _: Throwable => }
    try spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
    catch { case _: Throwable => }
    try {
      val now = spark.conf.getAll
      for ((k, v) <- now if baseConf.get(k).forall(_ != v) || !baseConf.contains(k)) {
        try baseConf.get(k) match {
          case Some(orig) => if (orig != v) spark.conf.set(k, orig)
          case None       => spark.conf.unset(k)
        } catch { case _: Throwable => () } // non-modifiable keys stay put
      }
    } catch { case _: Throwable => () }
  }

  /** Fixed CPU-bound calibration quantum (~100 ms on one unthrottled core).
    *
    * The sandbox VM intermittently throttles to ~1 core for minutes at a
    * time, which inflates a contiguous block of query timings 10-100x with
    * zero code change (rounds 4/5 artifacts). A fixed single-threaded
    * xorshift spin is a machine-speed probe: its wall time for a CONSTANT
    * iteration count is invariant to the queries and comparable across
    * rounds, so a throttled window is visible in the artifact itself —
    * the probe runs before and after every query attempt, and any attempt
    * whose surrounding probes exceed 2x the best probe seen this run is
    * marked dirty and retried.
    */
  private val SpinIters = 30000000L

  /** Committed cross-round ERA ANCHORS (VERDICT r14 "What's wrong" #1/#3):
    * the best run-level probe nominals observed on this host across the
    * r11–r14 committed artifacts (spin 0.0438 s for the fixed 30M-iter
    * xorshift; 0.116 s for the scan-agg spark probe). The within-run
    * cleanness gate stays anchored to the RUN-best probe (a genuinely
    * slower host era must not flag every query as throttled — that is
    * what `normalized` is for), but the artifact now reports
    * `era_spin_ratio` / `era_spark_ratio` = run-nominal ÷ era-anchor and
    * a `host_era` verdict, so a round like r14's close (spin 1.47× the
    * era with zero code change) is visible IN the artifact instead of
    * masquerading as a query regression. Cross-round comparisons read
    * the `normalized` map (query ÷ run-level spark nominal), never raw
    * seconds, whenever `host_era` != "nominal". Re-baseline these
    * constants only when a faster era is observed across two consecutive
    * rounds.
    */
  private val EraSpinNominal = 0.0438
  private val EraSparkNominal = 0.116
  private def spinOnce(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < SpinIters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    // data-dependent side effect so the JIT cannot eliminate the loop
    if (x == 42L) System.err.println("calibration fixed point")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      // state stores are per-query temp dirs here; aggressive background
      // maintenance only adds noise to the measured queries after q37
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "10min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup + page-cache warm of every input table, so the
    // first query touching a table isn't charged its cold I/O (standard
    // benchmarking hygiene; excluded from totals)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => }
      }
    } catch { case _: Throwable => }
    // the pristine conf every query must plan against (see hygiene)
    val baseConf: Map[String, String] = spark.conf.getAll
    // optional comma-separated query filter for profiling single operators
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq.sortBy(_._1)

    // Returns (elapsedSec, Some(errorMessage) if the query threw). Round-8
    // lesson: swallowing the exception here timed 21 analysis-broken queries
    // as ~0.05 s "successes" and the artifact reported them as the fastest
    // entries in the run. A failed attempt must be marked, excluded from
    // totals, and flagged in the headline.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString.take(200))
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }

    // Best spin time observed anywhere in the run = the unthrottled-speed
    // estimate for THIS machine. JIT-warm the spin, then seed with a few
    // samples; keep improving it as more probes land.
    spinOnce(); spinOnce()
    var calNominal = (1 to 5).map(_ => spinOnce()).min
    def probe(): Double = { val c = spinOnce(); if (c < calNominal) calNominal = c; c }

    // Second probe family (round-7 blind spot): a fixed small Spark job —
    // constant parquet scan → filter → shuffle aggregate — exercising file
    // I/O, task scheduling, shuffle, and GC. The round-7 driver artifact
    // inflated a 7-query block 4-5x with ZERO spin flags: the xorshift spin
    // detects CPU frequency throttling only, while an I/O/scheduler
    // contention window leaves it nominal. An attempt is clean iff BOTH
    // probe families sit within bounds of their run-best (spin 2x — tight,
    // it is deterministic; spark probe 3x — it carries GC/scheduler
    // jitter of its own).
    val probeDir = java.nio.file.Files
      .createTempDirectory("graft_bench_probe_").resolve("t.parquet").toString
    spark.range(300000).selectExpr("id", "id % 997 as k", "id * 31 % 1001 as v")
      .repartition(8).write.mode("overwrite").parquet(probeDir)
    def sparkProbeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(probeDir).where("v % 7 != 0")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v")).count()
      (System.nanoTime() - t0) / 1e9
    }
    sparkProbeOnce(); sparkProbeOnce()
    var sparkNominal = (1 to 3).map(_ => sparkProbeOnce()).min
    def sparkProbe(): Double = {
      val c = sparkProbeOnce(); if (c < sparkNominal) sparkNominal = c; c
    }

    // A transiently contended machine (another JVM, page-cache churn) can
    // inflate a single measurement 10-20x; a genuinely slow plan can't get
    // FASTER under contention. Min-of-n is the standard estimator for
    // wall-clock microbenchmarks under noise — applied UNIFORMLY to every
    // query. Each attempt is bracketed by calibration probes: an attempt is
    // "clean" iff max(before, after) <= 2x the best probe of the run. We
    // keep attempting until `runs` clean attempts land (bounded by
    // maxAttempts), take the min over clean attempts, and flag the query
    // `throttled` if no clean attempt was ever observed — so a throttled
    // window is distinguishable from a plan regression in the artifact.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val maxAttempts = runs + 4
    // locale-independent 4-decimal rounding: f"%.4f".toDouble throws under
    // comma-decimal locales (e.g. de_DE) and would kill the artifact
    def r4(d: Double): Double = math.rint(d * 1e4) / 1e4
    // Spark-probe bound tightened 3x -> 2x (VERDICT r14 #3: a 2.02x
    // contended sample passed the 3x gate unflagged and read as a q82
    // regression). The spin gate is deterministic CPU work, 2x stays;
    // the spark probe carries GC/scheduler jitter but its documented
    // same-slot spread is ~1.3x, so 2x still clears clean slots while
    // catching the 2x-class contention windows that matter.
    def isClean(spin: Double, sp: Double): Boolean =
      spin <= 2.0 * calNominal && sp <= 2.0 * sparkNominal
    case class QResult(time: Double, cal: Double, calSpark: Double,
        throttled: Boolean, attempts: Int, err: Option[String])
    val results = selected.map { case (name, fn) =>
      // (queryTime, worstAdjacentSpin, worstAdjacentSparkProbe, err)
      var attempts = List.empty[(Double, Double, Double, Option[String])]
      var nClean = 0
      var n = 0
      var consecErrs = 0
      while (n < maxAttempts && nClean < runs && consecErrs < 2) {
        val calBefore = probe()
        val spBefore = sparkProbe()
        val (d, err) = timeOne(name, fn)
        hygiene(spark, baseConf)
        // settle step (VERDICT r15 what's-wrong #2): an allocation-heavy
        // composite's own GC/state-write aftermath used to pollute its
        // TRAILING probes, permanently flagging the same queries
        // THROTTLED — measurement noise wearing a warning label. Drain
        // the SELF-induced debt before probing: explicit full GC + a
        // short cooldown, then ONE unrecorded warm-up spark probe that
        // absorbs the remaining one-time post-query penalty (cold codegen
        // cache, context-cleaner backlog, page-cache writeback from the
        // query's own fixture writes). Genuine EXTERNAL contention
        // outlives a settle + one probe read, so the cleanness gate's
        // 2x thresholds — unchanged — still catch the contended windows
        // that matter.
        System.gc()
        Thread.sleep(150)
        sparkProbeOnce() // warm-up, unrecorded
        val calAfter = probe()
        val spAfter = sparkProbe()
        val worst = math.max(calBefore, calAfter)
        val worstSp = math.max(spBefore, spAfter)
        attempts ::= ((d, worst, worstSp, err))
        // fail-fast only after TWO CONSECUTIVE errors: a deterministic
        // failure (AnalysisException etc.) reproduces immediately, while a
        // transient one (executor OOM, FS hiccup) gets exactly one more
        // chance instead of permanently marking the query FAILED
        if (err.isDefined) consecErrs += 1
        else { consecErrs = 0; if (isClean(worst, worstSp)) nClean += 1 }
        n += 1
      }
      // nominal may have improved after early cleanness decisions; re-judge
      // all attempts against the final nominal for the recorded artifact
      val ok = attempts.filter(_._4.isEmpty)
      val clean = ok.filter(a => isClean(a._2, a._3))
      val pool = if (clean.nonEmpty) clean else if (ok.nonEmpty) ok else attempts
      val chosen = pool.minBy(_._1)
      val r = QResult(chosen._1, chosen._2, chosen._3,
        clean.isEmpty && chosen._4.isEmpty, n, chosen._4)
      val flag =
        if (r.err.isDefined) "  FAILED" else if (r.throttled) "  THROTTLED" else ""
      System.err.println(
        f"[bench] $name%-22s ${r.time}%8.2f s  (cal ${r.cal}%.3f/${calNominal}%.3f, spark ${r.calSpark}%.3f/${sparkNominal}%.3f, ${r.attempts} attempts)$flag")
      name -> r
    }

    // Failed queries are EXCLUDED from the per-query time map and the total
    // (a crash time is not a query time) and surfaced twice: a `failed` name
    // list and an `errors` map, both in the headline portion of the line.
    val okResults = results.filter(_._2.err.isEmpty)
    // 4-decimal times: sub-0.1ms resolution is noise, and a compact line
    // matters — the driver scrapes a bounded tail window of sbt stdout and
    // round-9's full-precision line truncated mid-map (64/93 queries)
    val qs = okResults.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r4(v.time) }.mkString("{", ",", "}")
    val cals = okResults.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r4(v.cal) }.mkString("{", ",", "}")
    val calsSpark = okResults.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r4(v.calSpark) }.mkString("{", ",", "}")
    // Host-drift-normalized times: query time ÷ the RUN-LEVEL spark
    // calibration nominal (scan-agg probe median). Deliberately not the
    // per-query floor: each per-query calSpark is a single probe shot and
    // its run-to-run noise (±30%) swamps the host drift it would correct —
    // r10→r11 the per-query floors moved 0.24→0.19 median while the raw
    // query medians moved 0.995×. Cross-round comparisons should use
    // normalized[k]_new / normalized[k]_old.
    val normalized = okResults.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + r4(v.time / sparkNominal) }
      .mkString("{", ",", "}")
    val throttled = results.filter(_._2.throttled).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val failedNames = results.filter(_._2.err.isDefined).map(r => jstr(r._1))
      .mkString("[", ",", "]")
    val errors = results.collect { case (k, v) if v.err.isDefined =>
      jstr(k) + ":" + jstr(v.err.get) }.mkString("{", ",", "}")
    val total = okResults.map(_._2.time).sum
    if (results.exists(_._2.err.isDefined))
      System.err.println(s"[bench] WARNING: ${results.count(_._2.err.isDefined)} queries FAILED — excluded from total")
    // Field ORDER is load-bearing: the round-6 artifact was tail-truncated
    // mid-line and the only map left visible was `cal` (uniform ~0.065 s
    // probe times), which a reader mistook for query times. Put all the
    // small metadata FIRST and the per-query map LAST so any tail window
    // of the line contains real query times; also persist the full JSON
    // to BENCH_LOCAL.json so a truncated capture is always recoverable.
    val head = s"""{"metric":"total","value":${r4(total)},"unit":"sec","sf":"$sfDir"""" +
      s""","ok_count":${okResults.size},"failed_count":${results.size - okResults.size}""" +
      s""","failed":$failedNames,"errors":$errors""" +
      s""","corpus":${CorpusFingerprint.json(spark, sfDir)}""" +
      s""","cal_nominal":${r4(calNominal)},"cal_spin_iters":$SpinIters""" +
      s""","cal_spark_nominal":${r4(sparkNominal)}""" +
      s""","era_spin_ratio":${r4(calNominal / EraSpinNominal)}""" +
      s""","era_spark_ratio":${r4(sparkNominal / EraSparkNominal)}""" +
      s""","host_era":"${
        if (calNominal <= 1.25 * EraSpinNominal &&
          sparkNominal <= 1.25 * EraSparkNominal) "nominal"
        else "slow"}"""" +
      s""","throttled":$throttled"""
    // stdout line: headline + the per-query map ONLY, so the driver's
    // bounded tail capture holds all 93 queries; the per-query calibration
    // maps (diagnostics) live in BENCH_LOCAL.json, which is committed and
    // always whole
    val json = head + s""","queries":$qs}"""
    val fullJson = head +
      s""","cal":$cals,"cal_spark":$calsSpark,"normalized":$normalized,"queries":$qs}"""
    // FULL runs only: a SPARK_GRAFT_ONLY smoke run must never clobber the
    // committed round-close artifact with a partial query map (round 16:
    // a 4-query sf0.01 smoke briefly shipped as BENCH_LOCAL.json)
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (fullJson + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e") }
    // Human/tail-readable per-query lines on stdout, one per line, before
    // the machine-readable JSON line (which stays last for the driver).
    results.sortBy(_._1).foreach { case (k, v) =>
      val flag =
        if (v.err.isDefined) "  FAILED" else if (v.throttled) "  THROTTLED" else ""
      println(f"[bench-q] $k%-24s ${v.time}%8.3f s$flag")
    }
    println(json)
    try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(probeDir).getParent
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch { case _: Throwable => })
    } catch { case _: Throwable => }
    spark.stop()
  }
}
