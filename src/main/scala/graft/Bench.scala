package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are fully materialized through the `noop` sink (every column
  * produced, nothing collected to the driver), which measures the real
  * plan — `count()` would let Catalyst prune the work.
  */
object Bench {

  /** Raw PRODUCTION near-dup operators, benched as their own rows. The
    * oracled q10/q11/q18 run VALIDATED forms that additionally compute
    * the exact ground truth (PPJoin / all-pairs) the oracle needs — so
    * their bench rows price the correctness gate, not the operator a
    * user runs. These rows show the operator cost: same operators, same
    * parameters as the validated forms, minus the exact-truth pass.
    * Not in SparkEntry.queries: the LSH outputs are hash-engine-specific
    * (no DuckDB oracle), which is exactly why the gates exist.
    */
  val prodPaths: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prod_minhash_neardups" -> ((s, dir) =>
      graft.operators.Dedup.minhashNearDups(Tables.documents(s, dir),
        "text", "doc_id", shingleK = 5, numHashes = 64, bands = 16,
        threshold = 0.7)),
    "prod_simhash_neardups" -> ((s, dir) =>
      graft.operators.Dedup.simhashNearDups(Tables.documents(s, dir),
        "text", "doc_id", maxDist = 3)),
    "prod_embedding_neardups" -> ((s, dir) =>
      graft.operators.Dedup.embeddingNearDups(Tables.embeddings(s, dir),
        "vec_id", dim = 64, threshold = 0.35)),
  )

  /** Fixed synthetic CALIBRATION row — pure CPU, data-independent:
    * 1G codegen'd integer-hash rows on `defaultParallelism`
    * partitions, one scalar aggregate, no input, no shuffle of note.
    * The shared driver host demonstrably drifts (identical-code totals
    * swung 179→299 s within round 12), so raw cross-round medians
    * cannot separate regressions from machine weather. This row's
    * median IS the weather: to read BENCH_r{N} vs r{N-1}, divide each
    * query's median by the same round's `calib_cpu` median — a real
    * regression moves a query RELATIVE to calib_cpu; uniform host
    * inflation moves calib_cpu by the same factor. Excluded from the
    * adjudicated total (same rule as the prod_* rows: the metric's
    * population must stay the oracle-query set).
    */
  val calibration: Map[String, (SparkSession, String) => DataFrame] = Map(
    "calib_cpu" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      s.range(0L, 1L << 30, 1L, s.sparkContext.defaultParallelism)
        .select(xxhash64(col("id"),
          xxhash64(col("id"), xxhash64(col("id"), col("id")))).as("h"))
        .agg(bit_xor(col("h")).as("chk")) // xor: overflow-free under ANSI
    }))

  /** Silences ONE benign, identified error class on the DAGScheduler
    * logger: `Failed to update accumulator N (Unknown class) ...
    * non-existent accumulator`. Root cause (BENCH_r11 tail): SQL-metric
    * accumulators are registered WEAKLY in `AccumulatorContext`; the
    * bench loop runs ~200 queries x reps ≈ thousands of jobs in one
    * JVM, each rep's QueryExecution becomes garbage the moment `once()`
    * returns, and a GC between a job's last-needed result and the
    * event-loop's processing of straggler task-completion events leaves
    * those events pointing at cleared weak refs — DAGScheduler logs the
    * miss at ERROR and drops the (already unwanted) metric update.
    * Queries are unaffected (`failed: 0`); the spam only buries real
    * errors in the tail the driver captures. Filtered per-message on
    * the one logger, never by level — genuine DAGScheduler errors
    * (task/stage failures) still print, and real query failures
    * additionally surface via the `failed` counter. Best-effort: log
    * hygiene must never fail the bench.
    */
  private def muteAccumulatorGcRace(): Unit = try {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.filter.AbstractFilter
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    val name = "org.apache.spark.scheduler.DAGScheduler"
    val lc = Option(conf.getLoggerConfig(name)).filter(_.getName == name)
      .getOrElse {
        // no dedicated config yet: make one that inherits appenders
        // (additive) at the session's WARN level, so ONLY the filter
        // below differs from the parent behavior
        val fresh = new LoggerConfig(name,
          org.apache.logging.log4j.Level.WARN, true)
        conf.addLogger(name, fresh)
        fresh
      }
    lc.addFilter(new AbstractFilter(Filter.Result.DENY,
        Filter.Result.NEUTRAL) {
      override def filter(event: LogEvent): Filter.Result = {
        val msg = event.getMessage
        if (msg != null &&
            String.valueOf(msg.getFormattedMessage)
              .contains("Failed to update accumulator")) Filter.Result.DENY
        else Filter.Result.NEUTRAL
      }
    })
    ctx.updateLoggers()
  } catch { case e: Throwable =>
    System.err.println(s"[bench] accumulator-spam filter not installed: $e")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // testdata tables are single ~1-30MB files; the 128MB default would
      // scan each on ONE task. 4MB splits parallelize the scan stage while
      // staying far above per-task overhead. At real scale (many files /
      // row groups) this conf is harmless.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    muteAccumulatorGcRace()

    val allQueries = SparkEntry.queries ++ prodPaths ++ calibration

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try allQueries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = allQueries.keys.toSeq.sorted
    // warm-ups amortize JVM/codegen startup: a light query for the session
    // machinery, the HEAVY shingle/PPJoin family (q10 compiles the
    // kernels every dedup query reuses — r8 warmed it implicitly as
    // names.head; the prod_* rows sort before it now), and the first
    // measured slot
    once("q3_time_shift")
    once("q10_dedup_minhash")
    once(names.head)
    // median-of-n INTERLEAVED repeats: the shared driver host alternates
    // fast/slow windows (r3/r5 carried ~1.3x uniform inflation vs r2/r4 on
    // unchanged code), so a single-shot or back-to-back-repeat timing can't
    // separate plan changes from host contention. Running the whole suite n
    // times and taking each query's median means a transient slow window
    // pollutes one PASS, not every repeat of one query — the median drops
    // it. A query counts as FAILED (-1) if ANY run failed — a flaky query
    // must not silently report its lucky timings.
    // validated up front: a typo'd value must fail HERE with a clear
    // message, not NumberFormatException mid-run or an empty-passes
    // IndexOutOfBounds after the warm-up
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3")
    val reps = repsRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_BENCH_REPS must be an integer, got '$repsRaw'"))
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")

    // VALIDATION-PRICED rows run at exactly ONE rep and never earn
    // adaptive reps: their oracled forms additionally compute the exact
    // ground truth (PPJoin / all-pairs / exact-set / exact-count passes)
    // that only the correctness gate needs — they are adjudicated, not
    // adjudicating, and the cheap production paths are benched separately
    // as prod_* rows. One sample keeps them in the total's population
    // (round-over-round comparability) at a third of the wall-clock.
    val oneRep = Set("q10_dedup_minhash", "q11_dedup_simhash",
      "q217_source_sketch_sim", "q232_countmin_hitters", "q239_hll_distinct")

    // WALL-CLOCK BUDGET: the driver kills the bench invocation at ~60
    // minutes (BENCH_r15 rc=124 lost every measurement at 99%). The
    // budget is measured from main() entry, defaults well inside the
    // observed kill window, and degrades gracefully — completed samples
    // are always emitted (see the shutdown hook below), remaining passes
    // are skipped once the projected finish would bust it.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "2400")
      .toIntOption.getOrElse(
        sys.error("SPARK_GRAFT_BENCH_BUDGET_S must be an integer"))
    val tStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - tStart) / 1e9

    // samples guarded by a lock: the shutdown hook snapshots them from
    // another thread while a pass may still be appending
    val lock = new Object
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    def record(n: String, v: Double): Unit =
      lock.synchronized { samples(n) :+= v }

    // (median, central spread) of a query's samples. Spread is the range
    // of the CENTRAL half once >= 4 samples exist (the adaptive pass adds
    // samples, and a plain max-min can only grow with n — one transient
    // outlier would make convergence impossible by construction); at the
    // base n=3 it degrades to max-min, the r8 definition.
    def stats(s: Vector[Double]): (Double, Double) = {
      val sorted = s.sorted
      val n = sorted.size
      (sorted(n / 2), sorted((3 * n) / 4 min (n - 1)) - sorted(n / 4))
    }

    @volatile var emitted = false
    @volatile var phase = "pass-1"
    // Emit the one-line result from WHATEVER samples exist. Runs on the
    // normal path (partial=false) and from the JVM shutdown hook when the
    // driver's timeout SIGTERMs the process mid-suite (partial=true) —
    // BENCH_r15's rc=124 must never again mean "parsed": null. Queries
    // with zero samples are omitted from the maps and counted as skipped;
    // the compact stdout line stays fixed-size so the driver's tail
    // capture can never truncate it.
    def emit(partial: Boolean, extraRoundsRun: Int): Unit = {
      if (emitted) return
      emitted = true
      val snap = lock.synchronized { samples.toMap }
      val results: Seq[(String, Double, Double, Int)] = names.flatMap { n =>
        val s = snap.getOrElse(n, Vector.empty)
        if (s.isEmpty) None
        else if (s.exists(_ < 0)) Some((n, -1.0, -1.0, s.size))
        else { val (med, spread) = stats(s); Some((n, med, spread, s.size)) }
      }
      val skipped = names.size - results.size
      val qs = results.map { case (k, med, _, _) => "\"" + k + f"\":$med%.3f" }
        .mkString("{", ",", "}")
      val spreads = results.map { case (k, _, sp, _) => "\"" + k + f"\":$sp%.3f" }
        .mkString("{", ",", "}")
      val repMap = results.map { case (k, _, _, r) => "\"" + k + s"\":$r" }
        .mkString("{", ",", "}")
      // the suite total the driver adjudicates stays ORACLE-QUERY-ONLY: the
      // prod_* and calib_* rows are additional information, not a change to
      // the metric's population (a round-over-round total comparison must
      // compare the same query set)
      val total = results.collect {
        case (k, med, _, _) if med >= 0 && k.startsWith("q") => med }.sum
      val nFailed = results.count(_._2 < 0)
      // full record (per-query median + central-spread + rep-count maps)
      // goes to the file only: the driver captures just a stdout TAIL, and
      // the per-query map has outgrown that window before (BENCH_r04
      // "parsed": null). The LAST stdout line is a compact fixed-size total
      // so the driver's parse can never truncate.
      val fullLine =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"skipped":$skipped,"partial":$partial,"phase":"$phase","repeats":$reps,"extra_rounds":$extraRoundsRun,"elapsed_s":$elapsedS%.1f,"queries":$qs,"spread":$spreads,"reps":$repMap,"sf":"$sfDir"}"""
      sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("bench_out.json")).foreach { p =>
        try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), fullLine + "\n")
        catch { case e: Throwable => System.err.println(s"[bench] cannot write $p: $e") }
      }
      println(
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"skipped":$skipped,"partial":$partial,"repeats":$reps,"sf":"$sfDir"}""")
      System.out.flush()
    }
    val hook = new Thread(() => emit(partial = true, extraRoundsRun = -1))
    Runtime.getRuntime.addShutdownHook(hook)

    // MEASURED PASSES, budget-aware at two grains: (a) a pass is only
    // started if the previous pass's duration still fits the remaining
    // budget (pass times are suite-dominated, so the last pass is the
    // best predictor); (b) within a pass, each query checks the clock
    // before running, so even pass 1 on a pathologically slow host stops
    // with a clean partial instead of being killed mid-query.
    var pass = 0
    var lastPassS = 0.0
    var budgetHit = false
    while (pass < reps && !budgetHit &&
           (pass == 0 || elapsedS + lastPassS <= budgetS)) {
      pass += 1
      phase = s"pass-$pass"
      val t0 = elapsedS
      val it = names.iterator
      while (it.hasNext && !budgetHit) {
        val n = it.next()
        if (pass == 1 || !oneRep(n)) {
          if (elapsedS > budgetS) budgetHit = true
          else record(n, once(n))
        }
      }
      lastPassS = elapsedS - t0
    }

    // ADAPTIVE reps: median-of-3 was not converging for the >10 s queries
    // on the contended driver host (BENCH_r08: q10 spread 19.7 s vs
    // median 16.5). Queries whose central spread exceeds half their
    // median earn extra interleaved reps — bounded rounds, bounded TOTAL
    // executions (r15's unbounded-in-time loop is what the driver
    // killed), noisy set only — so adjudications don't hinge on one
    // lucky/unlucky window. The 0.5 s floor keeps sub-second queries
    // (scheduling noise dominates; nothing is adjudicated on them) from
    // burning reps.
    val extraRounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA", "4")
      .toIntOption.getOrElse(
        sys.error("SPARK_GRAFT_BENCH_EXTRA must be an integer"))
    val maxExtraExecs = 64
    var extraExecs = 0
    var round = 0
    var noisy = Seq.empty[String]
    while (round < extraRounds && !budgetHit && extraExecs < maxExtraExecs && {
      val snap = lock.synchronized { samples.toMap }
      noisy = names.filter { n =>
        !oneRep(n) && {
          val s = snap.getOrElse(n, Vector.empty)
          s.nonEmpty && s.forall(_ >= 0) && {
            val (med, spread) = stats(s)
            med >= 0.5 && spread > 0.5 * med
          }
        }
      }
      noisy.nonEmpty
    }) {
      round += 1
      phase = s"adaptive-$round"
      val it = noisy.iterator
      while (it.hasNext && !budgetHit && extraExecs < maxExtraExecs) {
        val n = it.next()
        if (elapsedS > budgetS) budgetHit = true
        else { record(n, once(n)); extraExecs += 1 }
      }
    }

    if (budgetHit) System.err.println(
      f"[bench] wall-clock budget ($budgetS s) hit at $elapsedS%.0f s in $phase — emitting partial")
    emit(partial = budgetHit, extraRoundsRun = round)
    Runtime.getRuntime.removeShutdownHook(hook)
    spark.stop()
  }
}
