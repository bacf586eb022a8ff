package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /** q21 round-trips ALL of lineitem through NDJSON text — at bench
    * scale that measures single-machine disk throughput, not plan
    * quality (17-38% of round-3 totals). Under the round-robin/min
    * protocol it is measured and reported per-query (tagged "io") but
    * excluded from the headline total/minsum so one disk-bound row
    * can't dominate the cross-round comparison. See BASELINE.md.
    */
  val IoTagged: Set[String] = Set("q21_roundtrip_ndjson")

  /** The suite's heaviest iterative/join rows — the r13 directive's
    * candidates for a forced gc + ContextCleaner drain immediately
    * before each sample. The r14 A/B (BASELINE.md) did NOT reproduce a
    * benefit: with pre-clean on vs off, these rows' mins differed by
    * less than the runs' ambient delta (q168 6.40 vs 6.66 s while the
    * q1_agg control moved 1.11 vs 0.97), i.e. whatever gc can reclaim
    * is already reclaimed by the gc-every-25 baseline, and the
    * remaining in-suite overhead (q168 ~1.7x its 3.8 s standalone
    * floor, inside the <=2x gate) is session accumulation + ambient,
    * not collectable garbage. Default OFF; SPARK_GRAFT_PRECLEAN=1
    * re-enables the lever for future bisections.
    */
  val PreClean: Set[String] = Set("q168_pagerank", "q170_prefix_jaccard_join",
    "q224_prefix_jaccard_star", "q225_kcore", "q226_hits")

  final case class QueryResult(
      samples: Vector[Double],
      errors: Vector[String]) {
    def min: Option[Double] = if (samples.isEmpty) None else Some(samples.min)
    def median: Option[Double] =
      if (samples.isEmpty) None
      else Some(samples.sorted.apply((samples.size - 1) / 2))
  }

  final case class BenchResult(results: Vector[(String, QueryResult)], sfDir: String) {
    private def headline = results.filterNot(r => IoTagged(r._1))
    def total: Double = headline.flatMap(_._2.median).sum
    def minSum: Double = headline.flatMap(_._2.min).sum
    def anyError: Boolean = results.exists(_._2.errors.nonEmpty)

    /** Degrade, don't zero (VERDICT r17 #4): a row with COMPLETED
      * samples keeps their min/median and is tagged — a single
      * ambient steal burst tripping the per-sample watchdog must not
      * fail the whole round artifact. rc=1 is reserved for rows with
      * NO completed sample (the true q245-class pathology: every
      * attempt errored or timed out, the row contributes nothing).
      */
    def fatalRows: Vector[String] = results.collect {
      case (n, r) if r.errors.nonEmpty && r.samples.isEmpty => n
    }
    /** Rows whose watchdog fired AFTER at least one completed sample —
      * reported so the artifact self-adjudicates (the kept min is a
      * quiet-sample floor; the burst shows in spread/samplesJson).
      */
    def overBudgetRows: Vector[String] = results.collect {
      case (n, r) if r.samples.nonEmpty &&
        r.errors.exists(_.startsWith("over budget")) => n
    }
    /** Rows that completed samples but ALSO hit a NON-watchdog error
      * (a genuine intermittent exception — OOM, nondeterministic
      * failure) on a later pass (ADVICE r18): these must not hide
      * behind rc=0 the way tagged watchdog bursts legitimately do, so
      * they get their own tagged list — CI gating on rc still sees
      * success (the kept min is real), but the artifact names the
      * anomaly instead of burying it in the errors map.
      */
    def anomalousRows: Vector[String] = results.collect {
      case (n, r) if r.samples.nonEmpty &&
        r.errors.exists(e => !e.startsWith("over budget")) => n
    }
    def rc: Int = if (fatalRows.nonEmpty) 1 else 0

    private def numMap(f: QueryResult => Option[Double]): String =
      results.flatMap { case (n, r) => f(r).map(v => s"\"" + n + "\":" + v) }
        .mkString("{", ",", "}")

    /** One-line JSON contract with the driver: metric/value/unit/queries/sf,
      * plus minsum, per-query mins, errors (only when present), and the
      * I/O-tagged exclusion list. Raw per-query samples live ONLY in
      * the samplesJson artifact (ADVICE r12 — duplicating them here
      * re-grew the line the compactJson note says outgrew the driver's
      * 2 kB stdout tail); the spread summary fields keep this line
      * self-adjudicating without the raw arrays.
      */
    def json: String = {
      val errs =
        if (!anyError) ""
        else {
          val m = results.filter(_._2.errors.nonEmpty).map { case (n, r) =>
            s"\"" + n + "\":\"" + r.errors.head.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          }.mkString("{", ",", "}")
          val ob = overBudgetRows.map("\"" + _ + "\"").mkString("[", ",", "]")
          val an = anomalousRows.map("\"" + _ + "\"").mkString("[", ",", "]")
          s""","errors":$m,"over_budget":$ob,"anomalies":$an,"rc":$rc"""
        }
      val io = IoTagged.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":$total,"unit":"sec","minsum":$minSum,""" +
        s""""queries":${numMap(_.median)},"mins":${numMap(_.min)}$errs,""" +
        s""""io_tagged":$io,""" +
        s""""spread_med":${fmt2(spreadMedian)},"spread_max":${fmt2(spreadMax)},""" +
        s""""sf":"$sfDir"}"""
    }

    private def fmt2(d: Double): String =
      java.lang.String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

    /** Per-query spread = max(sample)/min(sample): ~1.0 on a quiet
      * host; a CPU-steal burst shows as a 10-25x spread inside ONE
      * query's back-to-back samples. The suite median and max make the
      * artifact self-adjudicating (VERDICT r11 #1) — a driver run with
      * spread_med >> 1.2 was cut on a stolen window and its totals
      * can't be compared across rounds.
      */
    lazy val spreads: Vector[Double] = results.collect {
      case (_, r) if r.samples.nonEmpty && r.samples.min > 0 =>
        r.samples.max / r.samples.min
    }
    lazy val spreadMedian: Double =
      if (spreads.isEmpty) 1.0
      else spreads.sorted.apply((spreads.size - 1) / 2)
    lazy val spreadMax: Double = if (spreads.isEmpty) 1.0 else spreads.max

    /** Compact final-stdout-line summary. The full per-query map
      * (`json`) outgrew the driver's 2 kB stdout tail at 146 queries
      * ("parsed": null in BENCH_r07/r08) — so the LAST line printed is
      * this bounded summary (total/minsum/counts), and the per-query
      * detail lives in target/bench.json. Kept well under 500 chars
      * regardless of query count; BenchSpec enforces that.
      */
    def compactJson: String = {
      def fmt(d: Double): String =
        java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      val nErr = results.count(_._2.errors.nonEmpty)
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""minsum":${fmt(minSum)},"n":${results.size},"rc":$rc,""" +
        s""""errors":$nErr,"io_tagged":${IoTagged.size},""" +
        s""""spread_med":${fmt2(spreadMedian)},"spread_max":${fmt2(spreadMax)},""" +
        s""""detail":"target/bench.json","sf":"$sfDir"}"""
    }

    def samplesJson: String = {
      val all = results.map { case (k, r) =>
        s"\"" + k + "\":[" + r.samples.mkString(",") + "]"
      }.mkString("{", ",", "}")
      s"""{"sf":"$sfDir","samples":$all}"""
    }
  }

  /** Round-robin measurement: pass 1 visits EVERY query once, then pass
    * 2, then pass 3. This host shows minutes-long external CPU-steal
    * bursts (BASELINE.md): with back-to-back sampling a burst poisons
    * all 3 samples of a few queries (unrecoverable by min); interleaved,
    * it pollutes at most one sample of many queries, which per-query min
    * rejects. A sample that throws is recorded as an error, never as a
    * near-zero time (VERDICT r5 #2).
    */
  /** Daemon pool for the per-sample watchdog: samples run here so the
    * measuring thread can bound them; an abandoned (cancelled) sample
    * thread can't keep the JVM alive.
    */
  private lazy val samplePool = java.util.concurrent.Executors
    .newCachedThreadPool((r: Runnable) => {
      val t = new Thread(r, "bench-sample")
      t.setDaemon(true)
      t
    })

  /** @param budgetSecs per-SAMPLE wall-clock budget. One pathological
    *   query must cost one error row, never the whole artifact: the
    *   r15 driver bench died rc=124 (60-min timeout, zero data parsed)
    *   because a single un-floored query ran ~40 min/sample. A sample
    *   over budget has its Spark job group cancelled
    *   (interruptOnCancel), is recorded as an error, and the query's
    *   REMAINING passes are skipped — but a row with completed
    *   samples KEEPS their min and the run stays rc=0 (tagged
    *   `over_budget` in the artifact); rc=1 only when a row ends with
    *   zero completed samples (VERDICT r5 #2 + r17 #4).
    *   `SPARK_GRAFT_SAMPLE_BUDGET` overrides (seconds; 0 disables the
    *   watchdog entirely). Default 120 s ≈ 10× the suite's slowest
    *   healthy row's sf0.1 floor.
    */
  def run(
      spark: SparkSession,
      sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      passes: Int = 3,
      budgetSecs: Double =
        sys.env.get("SPARK_GRAFT_SAMPLE_BUDGET").map(_.toDouble).getOrElse(120.0)
  ): BenchResult = {
    // SPARK_GRAFT_GC=N: force a JVM gc every N samples (0 disables).
    // ContextCleaner reclaims shuffle files/broadcasts only when their
    // driver refs are collected — across a 600-sample session the
    // un-collected backlog produces the position-dependent drag on
    // heavy queries the r10 notes bisected (q168 floor 5.5 -> 6.9 s
    // after 55 queries; with gc every 10 samples it held 5.7-5.8, and
    // q162 ran at-or-below its standalone floor in both A/B repeats).
    // Default 25 ≈ +2.6 s of gc across a full ~190 s suite.
    val gcEvery = sys.env.get("SPARK_GRAFT_GC").map(_.toInt).getOrElse(25)
    val preClean = sys.env.get("SPARK_GRAFT_PRECLEAN").contains("1")
    var sampleNo = 0
    def timeOnce(name: String): Either[String, Double] = {
      // Some operators persist internal relations (LSH signatures etc.)
      // scoped to one invocation; clearing between samples keeps them
      // independent and bounds cache growth across 80+ queries.
      spark.catalog.clearCache()
      sampleNo += 1
      if (gcEvery > 0 && sampleNo % gcEvery == 0) System.gc()
      else if (preClean && PreClean(name)) {
        // heaviest rows: collect driver refs NOW so ContextCleaner can
        // reclaim shuffle files/broadcasts before the measurement, then
        // let its async queue drain for a beat (see PreClean doc).
        System.gc()
        Thread.sleep(100)
      }
      // noop-format write, not count(): count() lets Catalyst elide
      // sorts and prune every column, under-measuring ORDER BY and
      // wide-projection cost. The noop sink executes the full plan.
      def sample(): Double = {
        val t0 = System.nanoTime()
        queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      def errMsg(e: Throwable) =
        s"${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(200)
      if (budgetSecs <= 0) {
        try Right(sample())
        catch { case e: Throwable => Left(errMsg(e)) }
      } else {
        // Job groups are thread-local: set it INSIDE the sample thread,
        // cancel it from the measuring thread on budget overrun.
        val group = s"bench-$name-$sampleNo"
        val task = new java.util.concurrent.FutureTask[Double](() => {
          spark.sparkContext.setJobGroup(group, s"bench $name", true)
          try sample() finally spark.sparkContext.clearJobGroup()
        })
        samplePool.execute(task)
        try Right(task.get((budgetSecs * 1000).toLong,
          java.util.concurrent.TimeUnit.MILLISECONDS))
        catch {
          case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(group)
            task.cancel(true)
            Left(f"over budget: sample exceeded $budgetSecs%.0f s " +
              "(job group cancelled, remaining passes skipped)")
          case e: java.util.concurrent.ExecutionException =>
            Left(errMsg(Option(e.getCause).getOrElse(e)))
          case e: Throwable => Left(errMsg(e))
        }
      }
    }
    val names = queries.keys.toVector.sorted
    val acc = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> QueryResult(Vector.empty, Vector.empty)): _*)
    val overBudget = scala.collection.mutable.Set[String]()
    for (_ <- 1 to passes; n <- names if !overBudget(n)) {
      val r = acc(n)
      timeOnce(n) match {
        case Right(s) => acc(n) = r.copy(samples = r.samples :+ s)
        case Left(e) =>
          acc(n) = r.copy(errors = r.errors :+ e)
          if (e.startsWith("over budget")) overBudget += n
      }
    }
    BenchResult(acc.toVector, sfDir)
  }

  def main(args: Array[String]): Unit = {
    SparkEntry.assertContract("bench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // absolute: managed tables (q165 bucketed layout) must land
      // inside the repo regardless of the launcher's cwd
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths so the first measured
    // query doesn't absorb session init.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // Dev loop parity with Verify: SPARK_GRAFT_ONLY=q1_,q57_ restricts
    // the run to matching name prefixes (floor spot-checks on a busy
    // host). Unset = full run (the driver's mode).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val qs = SparkEntry.queries
      .filter(kv => only.forall(_.exists(kv._1.startsWith)))
    val res0 = run(spark, sfDir, qs)
    // The q211/q216 shared walk corpus is memoized, so whichever query
    // ran first paid the graph+walk build and every per-query min
    // discards it — ~4 s of real work invisible to minsum (VERDICT r13
    // #3). Report the build as its own row, exactly once, so
    // total/minsum stay like-for-like across rounds (BASELINE.md r14).
    // remove() rather than get(): consuming resets the accumulator, so
    // a second runAll in one JVM reports only builds ITS run paid for
    // (a cache-hit second run emits no walk-build row) — ADVICE r14
    // Same protocol for the q242/q244 shared PCA component (r16).
    val buildRows = Seq(
      "q211_walk_build" ->
        Option(graft.queries.Operators.walkBuildSeconds.remove(sfDir)),
      "q242_pca_build" ->
        Option(graft.queries.DedupSim.pcaBuildSeconds.remove(sfDir)))
      .collect { case (n, Some(b)) if b.doubleValue > 0 =>
        n -> QueryResult(Vector(b.doubleValue), Vector.empty)
      }
    val res = res0.copy(results = res0.results ++ buildRows)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_samples.json"), res.samplesJson + "\n")
      // Machine-readable copy of the result: the driver's stdout parse
      // has failed repeatedly ("parsed": null) — give it (and
      // BASELINE.md) a file to read instead (VERDICT r3 #2).
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench.json"), res.json + "\n")
      // FULL-suite runs additionally stamp bench_full*.json: any later
      // SPARK_GRAFT_ONLY dev run overwrites bench.json, and that
      // clobbered a round's committed per-query record once (VERDICT
      // r16 #3). Filtered runs never touch the _full files.
      if (only.isEmpty) {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("target/bench_full.json"), res.json + "\n")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("target/bench_full_samples.json"),
          res.samplesJson + "\n")
      }
    } catch { case _: Throwable => () }
    // Stop Spark BEFORE the result line so shutdown logging can't
    // interleave: the JSON is the very last thing on stdout. The full
    // per-query line precedes the compact one; only the LAST line must
    // fit the driver's tail window (VERDICT r8 #1).
    spark.stop()
    println(res.json)
    println(res.compactJson)
    // A crashing query must fail the artifact loudly (VERDICT r5 #2).
    if (res.rc != 0) sys.exit(res.rc)
  }
}
