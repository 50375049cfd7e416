package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the `noop` sink — unlike `count()`,
  * this computes every output column (count() lets Catalyst prune the
  * project away and would flatter narrow queries). Queries run in sorted
  * name order; a small warmup query first absorbs one-time session costs
  * (codegen compiler warmup, FileSourceStrategy init) so per-query numbers
  * measure the plan, not the JVM.
  *
  * Stability (the round-3 lesson — numbers that swing 3.5× between rounds
  * gate nothing):
  *  - the shape comparison runs FIRST, on a pristine session, so 70 queries
  *    of accumulated JVM/cache state can't pollute the one number that is
  *    compared against the reference baseline;
  *  - every query runs `reps` times and reports the MEDIAN, so one GC pause
  *    or compiler deopt can't fake a regression;
  *  - cached/checkpointed blocks are swept between queries — a query's
  *    timing must not depend on what the previous query leaked.
  */
object Bench {
  // 5 is the committed-record contract (the driver's full sf0.1 run);
  // SPARK_GRAFT_BENCH_REPS exists ONLY for huge generated-SF diagnostic
  // runs (sf100: one rep is minutes), where 3 reps keeps a median while
  // staying inside the round budget — SCALE.md marks any row measured
  // with fewer reps.
  private val Reps: Int = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5")
    val n =
      try raw.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_BENCH_REPS must be a positive integer, got '$raw'")
      }
    require(n >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $n " +
      "(0 reps would feed empty rep sets to the median)")
    n
  }

  /** Sweep session state a query may have left behind: CacheManager
    * entries and directly-persisted RDDs (localCheckpoint blocks backing a
    * returned frame land here too).
    */
  private def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  /** One rep's record: elapsed seconds, jobs launched, bytes scanned
    * (metered by the shared [[JobMeter]] — round-4 verdict: a wall-second
    * alone is not attributable; same jobs+bytes but more seconds =
    * measurement/JIT noise, more jobs or bytes = a plan change).
    */
  private final case class Rep(sec: Double, jobs: Long, scanBytes: Long, ok: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    // Host-drift canary (round-13 verdict #5): a fixed-shape in-memory
    // aggregation — 4M generated rows, 4096-key hash agg, one exchange —
    // measured before anything else, independent of SF and of the query
    // registry. Rounds 10-13 each spent effort re-adjudicating 1.3-1.9×
    // cross-round wall drift at unchanged jobs/bytes; dividing two
    // rounds' walls by their canaries removes the machine from the
    // comparison. Four runs: the first absorbs codegen/JIT warmup, the
    // median of the last three is recorded as `host_canary_sec`.
    val canarySec: Double =
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          spark.range(0L, 4000000L, 1L, 32)
            .selectExpr("id % 4096 as k", "id as v")
            .groupBy("k")
            .agg(org.apache.spark.sql.functions.sum("v").as("s"),
              org.apache.spark.sql.functions.avg("v").as("a"))
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val runs = (1 to 4).map(_ => once())
        runs.drop(1).sorted.apply(1)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] host canary failed: ${e.getMessage}"); -1.0
      }
    sweep(spark)

    // Matched-scale shape comparison FIRST (full runs only): the
    // reference's literal job structure vs the library's, same fixtures,
    // same deliverables, pristine session. Runs under the SAME trust
    // machinery as the per-query bench (round-8 verdict #1): interleaved
    // reps, median+min reported, jobs/bytes-gated retry — the headline
    // baseline ratio is a median of ≥5 paired runs, never one sample.
    val shape =
      if (args.isEmpty || args.headOption.contains("shape")) {
        try {
          val (ref, ours) = ShapeBench.compareRepped(spark, sfDir, Reps)
          // Locale.ROOT: the f-interpolator is locale-sensitive and would
          // emit comma decimals (invalid JSON) on e.g. de_DE JVMs
          String.format(java.util.Locale.ROOT,
            ""","shape_reps":%d,"baseline_shape_sec":%.3f,"baseline_shape_min_sec":%.3f,"graft_shape_sec":%.3f,"graft_shape_min_sec":%.3f,"shape_speedup":%.3f,"baseline_shape_jobs":%d,"graft_shape_jobs":%d,"baseline_shape_scan_mb":%d,"graft_shape_scan_mb":%d""",
            Int.box(math.max(ref.reps, ours.reps)),
            Double.box(ref.med.sec), Double.box(ref.minSec),
            Double.box(ours.med.sec), Double.box(ours.minSec),
            Double.box(ref.med.sec / ours.med.sec),
            Long.box(ref.med.jobs), Long.box(ours.med.jobs),
            Long.box(ref.med.scanBytes / 1048576), Long.box(ours.med.scanBytes / 1048576))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] shape compare failed: ${e.getMessage}")
            ""","shape_error":true"""
        }
      } else ""
    sweep(spark)

    val meter = new JobMeter
    spark.sparkContext.addSparkListener(meter)

    // One timed+metered rep; failure is recorded, never masked (a crashed
    // query must not contribute an innocent-looking small timing).
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Rep = {
      meter.reset()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      val r = Rep(sec, meter.jobs.get, meter.bytes.get, ok)
      sweep(spark)
      r
    }

    // The rep with the MEDIAN wall time (its jobs/bytes ride along, so the
    // reported triple is one real run, not a mix), plus the MIN wall time:
    // identical jobs/bytes with median >> min is self-evidently environment
    // noise, not a plan regression (round-5 verdict: the closing-run
    // environment inflated a handful of queries 2-6× at unchanged plans).
    // A single failed rep marks the query failed — crashes must stay
    // visible, not be medianed away.
    def medianOf(reps: Seq[Rep]): (Rep, Double) = {
      val med = reps.sortBy(_.sec).apply(reps.size / 2)
      (med.copy(ok = reps.forall(_.ok)), reps.map(_.sec).min)
    }

    // warmup: touch every fixture table once (scan + codegen warm)
    try graft.sources.Tables.registerAll(spark, sfDir) catch { case _: Throwable => }
    try spark.sql("select count(*) from lineitem").collect() catch { case _: Throwable => }

    // optional substring filter (local iteration): `runMain graft.Bench q44`
    // or comma-separated `runMain graft.Bench q60,q61,q97` (any match);
    // `runMain graft.Bench shape` runs only the shape comparison.
    // Resolved BEFORE the prepare steps so a filtered run only builds the
    // fixtures/indexes its queries actually read (a generated-sf ramp run
    // was paying 30+ min of media fixture synthesis for queries it never
    // executed).
    val selected = args.headOption match {
      case Some("shape") => Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
      case Some(subs) =>
        val pats = subs.split(',').filter(_.nonEmpty)
        SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
      case None => SparkEntry.queries
    }
    def selectedHas(subs: String*): Boolean =
      selected.keys.exists(n => subs.exists(n.contains))

    // q93's corpus index is persisted state in production (the point of
    // the incremental shape) — build it once here, UNTIMED, report the
    // build cost as its own field, and let the timed reps measure the
    // per-batch probe against the stored index (round-6 verdict: re-
    // deriving the index every rep made q93's number dishonest).
    val prepared = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (canarySec >= 0) prepared("host_canary_sec") = canarySec
    if (selectedHas("q93")) try {
      import org.apache.spark.sql.functions.col
      val idxPath = new java.io.File("target/bench_idx/q93_corpus_sig").getAbsolutePath
      val t0 = System.nanoTime()
      graft.ops.Dedup.minHashSignatures(
          graft.sources.Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 25 =!= 0), "doc_id", "text",
          shingleK = 1, numHashes = 48)
        .write.mode("overwrite").parquet(idxPath)
      prepared("q93_index_build_sec") = (System.nanoTime() - t0) / 1e9
      sys.props("graft.bench.q93.index") = idxPath
    } catch { case e: Throwable =>
      System.err.println(s"[bench] q93 index prepare failed (falls back to inline build): ${e.getMessage}")
    }
    sweep(spark)

    // q265's KMV store is persisted state the same way (build untimed,
    // report the cost, let the timed reps measure the READBACK rollup
    // only — the split the gold theta store has had since q252/q253)
    if (selectedHas("q265")) try {
      val storePath = new java.io.File("target/bench_idx/q265_kmv_store").getAbsolutePath
      val t0 = System.nanoTime()
      graft.queries.MedallionQueries.buildKmvStore(spark, sfDir, storePath)
      prepared("q265_store_build_sec") = (System.nanoTime() - t0) / 1e9
      sys.props("graft.bench.q265.store") = storePath
    } catch { case e: Throwable =>
      System.err.println(s"[bench] q265 store prepare failed (falls back to inline build): ${e.getMessage}")
    }
    sweep(spark)

    // q266's IVF index is persisted state the same way (build once per
    // corpus refresh, probe per request batch) — build untimed, report
    // the cost, let the timed reps measure the PROBE-ONLY read path
    if (selectedHas("q266")) try {
      val idxPath = new java.io.File("target/bench_idx/q266_ivf_index").getAbsolutePath
      val t0 = System.nanoTime()
      graft.queries.SimilarityQueries.buildIvfIndex(spark, sfDir, idxPath)
      prepared("q266_index_build_sec") = (System.nanoTime() - t0) / 1e9
      sys.props("graft.bench.q266.index") = idxPath
    } catch { case e: Throwable =>
      System.err.println(s"[bench] q266 index prepare failed (falls back to inline build): ${e.getMessage}")
    }
    sweep(spark)

    // Media fixtures are input SYNTHESIS, not the measured op: pre-build
    // them untimed (Fixtures builds once per JVM — the timed reps then
    // measure decode/hash/frame work only) and report each build as its
    // own field (round-10 verdict #5: q129/q145/q230's sf1 "superlinear"
    // rows were fixture-build artifacts; the committed record now says so
    // in numbers). q145 shares q129's fixture, q195 shares q194's.
    for ((key, users, build) <- Seq[(String, Seq[String], () => String)](
      ("q129_q145_fixture_build_sec", Seq("q129", "q145"),
        () => graft.queries.Fixtures.audioMedia(spark, sfDir)),
      ("q194_q195_fixture_build_sec", Seq("q194", "q195"),
        () => graft.queries.Fixtures.imageMedia(spark, sfDir)),
      ("q230_fixture_build_sec", Seq("q230"),
        () => graft.queries.Fixtures.audioFramesMedia(spark, sfDir)),
      ("q240_fixture_build_sec", Seq("q240"),
        () => graft.queries.Fixtures.mp4Media(spark, sfDir)))
         if selectedHas(users: _*)) {
      try {
        val t0 = System.nanoTime()
        build()
        prepared(key) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $key prepare failed (falls back to inline build): ${e.getMessage}")
      }
    }
    sweep(spark)

    // Per-stage diagnostics for the two composed chains (round-12 verdict
    // #2, extending the q93_index_build_sec precedent): each stage frame is
    // materialized ONCE through noop, so the committed record carries
    // `q97_stage_{gate,dedup,decontam,rollup}_sec` and
    // `q138_stage_{curate,mix,pack,shard}_sec`. Times are CUMULATIVE — a
    // stage re-runs its upstream chain, so the per-stage attribution is the
    // difference of consecutive fields (one cold run each: these are
    // diagnostic splits, not gated medians — the gated number stays the
    // parent query's repped median). Also emitted on filtered runs naming
    // the parent query, so sf-ramp snapshots carry the split.
    def stageSplit(parent: String,
                   stages: => Seq[(String, org.apache.spark.sql.DataFrame)]): Unit = {
      // SPARK_GRAFT_SKIP_STAGES=1 skips the diagnostic splits (huge-SF
      // runs where one cumulative stage walk costs more than the repped
      // query itself); the committed sf0.1 record always carries them.
      // Compared against "1" exactly — SPARK_GRAFT_SKIP_STAGES=0 runs
      // the splits (r13 ADVICE: presence-testing made =0 skip too).
      val wanted = !sys.env.get("SPARK_GRAFT_SKIP_STAGES").contains("1") && (args.isEmpty ||
        args.headOption.exists(_.split(',').exists(p => p.nonEmpty && parent.contains(p))))
      if (wanted) try {
        for ((name, df) <- stages) {
          val t0 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          prepared(s"${parent}_stage_${name}_sec") = (System.nanoTime() - t0) / 1e9
          sweep(spark)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $parent stage split failed: ${e.getMessage}")
      }
    }
    stageSplit("q97", graft.queries.TextQueries.curationStages(spark, sfDir))
    stageSplit("q138", graft.queries.TextQueries.assemblyStages(spark, sfDir))

    val ordered = selected.toSeq.sortBy(_._1)
    // Reps are INTERLEAVED round-robin across queries (rep 1 of every
    // query, then rep 2, ...) so a transient load spike degrades one rep
    // of many queries — which the median absorbs — instead of sitting on
    // all reps of whichever query it landed on (round-6 verdict: closing-
    // environment load inflated three queries' medians 2-3.7×).
    val results: Seq[(String, (Rep, Double))] =
      try {
        val byName = scala.collection.mutable.Map.empty[String, Vector[Rep]]
          .withDefaultValue(Vector.empty)
        for (_ <- 1 to Reps; (name, fn) <- ordered)
          byName(name) = byName(name) :+ runOne(fn)
        // Up to TWO retry rounds for environment-noise victims: a median
        // > 1.5× min at equal jobs/bytes is load, not plan (round-9
        // verdict #2: the old single >2× round left three queries in the
        // 1.6-1.9× gap reading as regressions) — re-measure and keep the
        // cleaner (lower-median) rep set; the min stays the global min, so
        // a genuinely slow query cannot launder its number here. The
        // jobs/scanBytes equality between the median and min reps is
        // CHECKED, not assumed (round-7 ADVICE): a query with genuinely
        // bimodal plans (e.g. AQE re-planning differently per rep) has
        // different job counts and must keep its honest median.
        // The global min is tracked as a full Rep (not just its seconds) so
        // the jobs/scanBytes plan-equality guard is checked against the
        // ACTUAL rep whose time triggers the retry and is reported as min —
        // including one from a since-discarded rep set (round-10 ADVICE: a
        // min from a dropped set was never plan-validated against the
        // reported median, weakening the "CHECKED, not assumed" invariant).
        val current = scala.collection.mutable.Map.empty[String, Vector[Rep]]
        val globalMinRep = scala.collection.mutable.Map.empty[String, Rep]
        val okAll = scala.collection.mutable.Map.empty[String, Boolean]
        for ((name, _) <- ordered) {
          current(name) = byName(name)
          globalMinRep(name) = current(name).minBy(_.sec)
          okAll(name) = current(name).forall(_.ok)
        }
        for (round <- 1 to 2) {
          val retryNames = ordered.filter { case (name, _) =>
            val reps = current(name)
            val med = reps.sortBy(_.sec).apply(reps.size / 2)
            val minRep = globalMinRep(name)
            okAll(name) && minRep.sec > 0 &&
              med.sec > 1.5 * minRep.sec &&
              med.jobs == minRep.jobs &&
              math.abs(med.scanBytes - minRep.scanBytes) <=
                math.max(minRep.scanBytes / 10, 1L << 20)
          }
          if (retryNames.nonEmpty)
            System.err.println(s"[bench] retry round $round, noisy medians: ${retryNames.map(_._1).mkString(",")}")
          val retried = scala.collection.mutable.Map.empty[String, Vector[Rep]]
            .withDefaultValue(Vector.empty)
          for (_ <- 1 to Reps; (name, fn) <- retryNames)
            retried(name) = retried(name) :+ runOne(fn)
          for ((name, reps) <- retried) {
            val newMin = reps.minBy(_.sec)
            if (newMin.sec < globalMinRep(name).sec) globalMinRep(name) = newMin
            okAll(name) = okAll(name) && reps.forall(_.ok)
            val oldMed = current(name).sortBy(_.sec).apply(current(name).size / 2)
            val newMed = reps.sortBy(_.sec).apply(reps.size / 2)
            if (newMed.sec < oldMed.sec) current(name) = reps
          }
        }
        ordered.map { case (name, _) =>
          val med = current(name).sortBy(_.sec).apply(current(name).size / 2)
          name -> (med.copy(ok = okAll(name)), globalMinRep(name).sec)
        }
      } finally spark.sparkContext.removeSparkListener(meter)
    // Per-query record is [median_sec, min_sec, jobs, scan_mb] (round-4
    // verdict: wall seconds alone make regressions unattributable; round-5
    // verdict: min exposes environment noise) — median negative on
    // failure. The capture of this line is TAIL-truncated downstream, so
    // the headline numbers (shape comparison, total) go at the END where
    // they always survive, and the full record is also written to
    // BENCH_DETAIL.json.
    val qs = results.map { case (k, (r, minSec)) =>
      String.format(java.util.Locale.ROOT, """"%s":[%.2f,%.2f,%d,%d]""",
        k, Double.box(if (r.ok) r.sec else -r.sec), Double.box(minSec),
        Long.box(r.jobs), Long.box(r.scanBytes / 1048576))
    }.mkString("{", ",", "}")
    val failures = results.collect { case (k, (r, _)) if !r.ok => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, (r, _)) if r.ok => r.sec }.sum

    val preparedJson = prepared.map { case (k, v) =>
      String.format(java.util.Locale.ROOT, ""","%s":%.3f""", k, Double.box(v))
    }.mkString
    val line = String.format(java.util.Locale.ROOT,
      """{"metric":"total","unit":"sec","reps":%d,"legend":"queries: name -> [median_sec, min_sec, jobs, scan_mb]","failures":%s,"queries":%s%s%s,"value":%.3f,"sf":"%s"}""",
      Int.box(Reps), failures, qs, shape, preparedJson, Double.box(total), sfDir)
    // only a FULL run may replace the committed record — a substring-
    // filtered iteration (`runMain graft.Bench q44`) or shape-only run
    // would clobber the 78-query file with a partial one
    if (args.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        line.getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    println(line)
    // The round-record capture keeps only the LAST 2000 chars of stdout
    // (measured from the r9 snapshot), minus an ~80-char sbt epilogue —
    // any final line longer than ~1.9 KB gets BEHEADED and the snapshot
    // holds an unparseable fragment (this happened in rounds 7 AND 9;
    // round-9 verdict #1 is explicit: the committed record must stand
    // alone). At 216+ queries NO per-query encoding fits that window, so
    // the layering is:
    //  - full per-query record  -> BENCH_DETAIL.json  (committed)
    //  - compact qnum-keyed [med_s,min_s,jobs,scan_mb] -> BENCH_COMPACT
    //    .json (committed; small, diff-friendly, supports snapshot-free
    //    regression adjudication)
    //  - the FINAL stdout line carries the summary keys PLUS the compact
    //    qnum-keyed map (round-17: the driver's per-query comparator reads
    //    only this line — see the note at summaryLine); headline keys sit
    //    at the very end so even a tail-truncated capture shows them, and
    //    the committed BENCH_COMPACT.json holds the identical map for any
    //    consumer that needs a guaranteed-complete parse.
    val detailCompact = results.map { case (k, (r, minSec)) =>
      String.format(java.util.Locale.ROOT, """"%s":[%.2f,%.2f,%d,%d]""",
        k.stripPrefix("q").takeWhile(_ != '_'),
        Double.box(if (r.ok) r.sec else -r.sec),
        Double.box(minSec), Long.box(r.jobs), Long.box(r.scanBytes / 1048576))
    }.mkString("{", ",", "}")
    val compactLine = String.format(java.util.Locale.ROOT,
      """{"metric":"total","unit":"sec","reps":%d,"fmt":"qnum:[med_s,min_s,jobs,scan_mb]","failures":%s%s%s,"queries":%s,"value":%.3f,"sf":"%s"}""",
      Int.box(Reps), failures, shape, preparedJson, detailCompact, Double.box(total), sfDir)
    if (args.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_COMPACT.json"),
        compactLine.getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] compact write failed: ${e.getMessage}") }
    println(compactLine)
    val nFail = results.count { case (_, (r, _)) => !r.ok }
    val failNames = results.collect { case (k, (r, _)) if !r.ok => "\"" + k + "\"" }
      .take(10).mkString("[", ",", "]")
    // Round-17 measurement fix (r16 verdict #2): the driver's per-query
    // round-over-round comparator reads ONLY the final "metric":"total"
    // line, and for two rounds its per_query came out empty because the
    // qnum-keyed timing map lived on the earlier BENCH_COMPACT line. The
    // final line now CARRIES the map (additions-only: every prior key —
    // value, n_queries, failures, canary, fixture fields — is kept, and
    // the headline keys stay at the very end so a tail-truncated capture
    // still shows them). The old bounded-size summary keys are unchanged;
    // BENCH_DETAIL/COMPACT files still hold the same record.
    val summaryLine = String.format(java.util.Locale.ROOT,
      """{"metric":"total","unit":"sec","reps":%d,"n_queries":%d,"n_failures":%d,"failures":%s,"fmt":"qnum:[med_s,min_s,jobs,scan_mb]","queries":%s%s%s,"detail":"BENCH_DETAIL.json","compact":"BENCH_COMPACT.json","value":%.3f,"sf":"%s"}""",
      Int.box(Reps), Int.box(results.size), Int.box(nFail), failNames,
      detailCompact, shape, preparedJson, Double.box(total), sfDir)
    println(summaryLine)
    spark.stop()
  }
}
