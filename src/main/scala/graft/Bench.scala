package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Warmup first touches every table (file-footer + page cache + JIT +
  * codegen warm) so per-query numbers measure the query, not first-touch
  * costs; queries then run in sorted name order for run-to-run stability.
  *
  * BURST ARBITRATION (r9 VERDICT #1): two consecutive driver snapshots
  * read 8-40x over the committed idle min-of-3 on a contiguous block of
  * queries, and the exculpatory evidence (ambient CPU bursts on the
  * shared host) lived only in SCALE.md prose. This run now settles the
  * question inside the artifact itself:
  *
  *  - every query carries wall-clock start/end stamps (offsets from
  *    suite start on the stdout line, epoch millis in the sidecar), so
  *    an alphabetically/temporally CONTIGUOUS slow window is visible
  *    from the JSON alone;
  *  - any query whose fresh min reads >[[FlagRatio]]x its previously
  *    committed BENCH_LOCAL time (and >[[FlagAbsSeconds]] absolute —
  *    the same thresholds the BenchRegressionSpec latch fails on,
  *    hoisted into shared constants after the spec's comment drifted
  *    from the code, r10 ADVICE) is re-measured MIN-OF-3, alone, after
  *    the whole suite (min-of-1 until r10, whose single dirty
  *    re-measure of x_common_neighbors_capped couldn't distinguish a
  *    burst spanning suite end from code drift — the round's only weak
  *    flag; r10 VERDICT #1). A clean re-measure (back near the
  *    committed time, identical code, same JVM) proves the earlier
  *    reading was an environment burst; a dirty one indicts the code.
  */
object Bench {

  /** Flag/latch ratio: a query is flagged (and BenchRegressionSpec
    * latches) when its fresh min exceeds the committed time by this
    * factor. Streaming drains get a wider band in the spec (see there).
    */
  val FlagRatio = 1.5

  /** Absolute flag/latch floor in seconds — ratio alone would flag
    * millisecond queries on scheduler noise. 0.5 s while the isolated
    * re-measure was a single cold rep; min-of-3 re-measures absorb that
    * flake risk, so the bar tightened to 0.25 s (r10 VERDICT #4 — the
    * x_unpivot re-measure escaped arbitration through the 0.5 s gap).
    */
  val FlagAbsSeconds = 0.25

  /** Window-quality canary queries and their degraded thresholds in
    * seconds (r14 VERDICT #1): three straight rounds burned effort
    * re-attributing ambient host windows after the fact (r14: 12
    * spurious flags at 191.64 s vs the 137.87 s zero-flag idle
    * reference at the SAME HEAD). The t2/t3 streaming drains are the
    * sharpest window probe this registry has (SCALE.md bench-window
    * logs): clean windows read ~1.7-2.6 / 1.1-1.2 s, degraded
    * (hypervisor-contention) windows 5-25 s — nothing in between has
    * ever been observed. Thresholds sit in that dead band with ~1.5x
    * margin to the clean ceiling.
    */
  val CanaryThresholds: Seq[(String, Double)] = Seq(
    "t2_streaming_merge" -> 4.0,
    "t3_streaming_dedup" -> 2.0)

  /** The sf the canary thresholds were measured at. The canary queries
    * run against SPARK_GRAFT_SF_DIR, so at any other scale their
    * latencies move with the DATA, not the window — the r15 sf1
    * scaling sweep read a healthy post-suite t3 at 2.78 s and
    * classified a working window `degraded`. At foreign sf the canary
    * still RUNS (its raw seconds are scaling evidence) but
    * classification reports `unknown`, never a false verdict either way.
    */
  val CanaryCalibratedSf = "sf0.1"

  /** Classify a bench window from canary samples: `degraded` when any
    * sample is at/over its threshold, `clean` when all are under,
    * `unknown` when no sample exists (canary disabled or queries
    * missing). Pre- AND post-suite samples feed this, so degradation
    * that starts mid-suite is still caught.
    */
  def windowQuality(canary: Seq[(String, Double)]): String = {
    val thresholds = CanaryThresholds.toMap
    if (canary.isEmpty) "unknown"
    else if (canary.exists { case (q, s) => thresholds.get(q).exists(s >= _) })
      "degraded"
    else "clean"
  }

  /** [[windowQuality]] gated on the calibrated sf — the spelling main
    * uses (latch-spec-pinned with the sf1 misclassification shape).
    */
  def classifyWindow(sfLabel: String, canary: Seq[(String, Double)]): String =
    if (sfLabel == CanaryCalibratedSf) windowQuality(canary) else "unknown"

  /** Whether a full-suite run may REPLACE the committed BENCH_LOCAL.json
    * reference (r14 VERDICT #5: the driver's round-close run overwrote
    * it with a busy-host copy three rounds running). The committed-
    * reference protocol is "cleanest full idle run", so a snapshot only
    * earns the slot by being FASTER than the standing reference;
    * anything slower goes to a timestamped side file unless forced
    * (`SPARK_GRAFT_BENCH_COMMIT_REF=1` — e.g. after a registry change
    * that legitimately raises the total).
    *
    * A reference at a DIFFERENT sf also blocks (r15 found-and-fixed:
    * the first guard spelled it "stale, not standing" → `None`, which
    * let an sf1 scaling sweep launched from the repo root CLOBBER the
    * committed sf0.1 reference — and a clobbered-to-foreign-sf local
    * file silently CANCELS the BenchRegressionSpec latch, which skips
    * on sf mismatch. Totals at different sf aren't comparable, so the
    * faster-total rule can't arbitrate; only the explicit force flag
    * — a deliberate sf migration — takes the slot.)
    */
  def mayOverwriteReference(existingTotal: Option[Double], newTotal: Double,
                            force: Boolean, sameSf: Boolean = true): Boolean =
    force || (sameSf && existingTotal.forall(_ > newTotal))

  /** Median of per-query fresh/committed ratios — the arbitration
    * signal for the SECOND ambient mode (r15, graph-family
    * arbitration): uniform instance-speed scaling. The t2/t3 canary
    * catches contention BURSTS (wall-clock-sensitive drains inflate
    * 2.5-5x), but a host instance that is simply ~1.3x slower across
    * the board (different hypervisor placement after a reboot) reads
    * `clean` on the canary while every query — and therefore a handful
    * of >1.5x flags — drifts up together. The median over the whole
    * registry names that mode from the artifact alone: flags whose
    * ratios sit AT the suite median are the uniform ambient, not code
    * (r15 full-suite evidence: median 1.29, flagged graph family
    * 1.30-1.43, twelve flags on a DIFFERENT query set than r14's).
    * A code regression moves its own queries' ratios off the median;
    * it cannot move the median of 198.
    */
  def medianRatio(ratios: Seq[Double]): Option[Double] = {
    if (ratios.isEmpty) None
    else {
      val s = ratios.sorted
      val n = s.size
      Some(if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2)
    }
  }

  /** Reference-BAND flagging (r15 VERDICT #4). Root cause of the
    * rounds-13–15 flag churn: build/training queries have the
    * registry's widest clean-window variance, yet every flag was judged
    * against the single cleanest window ever observed — so each round
    * the same wall-clock-sensitive queries rotated through the flag
    * list on ambient weather alone. The fix keeps the flag REFERENCE at
    * the historical per-query min (detection anchor unchanged) but
    * widens each query's ratio to its OWN measured clean-window spread:
    *
    *   threshold_q = clamp(spread_q · BandMargin, FlagRatio, BandCap)
    *
    * where spread_q = max/min of the query's times across the last
    * ≤[[MaxBandRefs]] clean same-sf FULL snapshots (committed reference
    * + gitignored sidecars + newest driver snapshot), TRIMMED of the
    * single slowest run when ≥3 are available. The trim is the
    * detection guard: a genuine regression appears in only the newest
    * run, gets dropped from its own band, and still flags against the
    * tight historical spread — while a query whose variance shows in
    * MANY clean runs keeps its honest wide band. [[BandCap]] retains
    * detection unconditionally: even the widest band still flags at 3×.
    * With <2 observations the band degenerates to the point-reference
    * [[FlagRatio]] (first run, fresh clone). Expected steady state on a
    * uniformly ~1.3× ambient host: ≈0 flags, with the off-median signal
    * (`median_vs_ref`) unchanged as the code-vs-host arbiter.
    */
  val BandMargin = 1.15
  val BandCap = 3.0
  val MaxBandRefs = 5

  /** Per-query flag threshold from its observed clean-run times — see
    * the band rationale above. Latch-spec-pinned.
    */
  def bandThreshold(times: Seq[Double]): Double = {
    val t = times.filter(_ > 0).sorted
    if (t.size < 2) FlagRatio
    else {
      val trimmed = if (t.size >= 3) t.dropRight(1) else t
      math.min(BandCap, math.max(FlagRatio, trimmed.last / trimmed.head * BandMargin))
    }
  }

  /** [[bandThreshold]] per query over a set of parsed runs. */
  def bandThresholds(runs: Seq[Map[String, Double]]): Map[String, Double] =
    runs.flatMap(_.keys).distinct
      .map(k => k -> bandThreshold(runs.flatMap(_.get(k)))).toMap

  /** Per-query times from a snapshot's (unescaped) "queries" block —
    * the one parser behind reference flagging, the band, and the
    * BenchRegressionSpec latch. Driver snapshots embed an ESCAPED copy
    * inside their "tail" string; the (?<!\\) guard skips it.
    */
  def parseQueryTimes(json: String): Map[String, Double] =
    """(?<!\\)"queries":\s*\{""".r.findFirstMatchIn(json).map { m =>
      val start = m.end
      val end = json.indexOf("}", start)
      if (end < 0) "" else json.substring(start, end)
    } match {
      case None => Map.empty
      case Some(body) =>
        """"([A-Za-z0-9_]+)":\s*([0-9][0-9.eE+-]*)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

  /** Whether a snapshot may contribute to the band: same sf, and not a
    * self-declared degraded window (a pre-canary file with no
    * window_quality field is accepted — the committed reference
    * predates the field on some hosts, and a degraded sidecar is the
    * only case that would corrupt the spread). Partial (ONLY-filtered)
    * runs never match — they write to BENCH_LOCAL_partial.json, which
    * is not a band source.
    */
  def bandEligible(json: String, sfLabel: String): Boolean =
    sfLabelOf(json).exists(sameSfLabel(_, sfLabel)) &&
      !json.contains(""""window_quality":"degraded"""")

  /** The band's snapshot set for `sfLabel`, read from `dir`: committed
    * reference + newest driver snapshot + the ≤[[MaxBandRefs]] most
    * recent eligible sidecars (`BENCH_LOCAL.<t0>.json` — gitignored,
    * the host's memory of its own clean windows). ONE collector behind
    * both the Bench flagging pass and the BenchRegressionSpec latch, so
    * the two can never disagree about what the band saw.
    */
  def bandRunsIn(dir: java.nio.file.Path, sfLabel: String): Seq[Map[String, Double]] = {
    def eligibleRun(p: java.nio.file.Path): Option[Map[String, Double]] =
      if (!java.nio.file.Files.exists(p)) None
      else {
        val s = java.nio.file.Files.readString(p)
        if (bandEligible(s, sfLabel)) Some(parseQueryTimes(s)).filter(_.nonEmpty)
        else None
      }
    val driverPath = (1 to 99).map(n => dir.resolve(f"BENCH_r$n%02d.json"))
      .filter(java.nio.file.Files.exists(_)).lastOption
    val sidecars = {
      val rx = """BENCH_LOCAL\.(\d+)\.json""".r
      val listed = java.nio.file.Files.list(dir)
      val files =
        try listed.iterator().asScala.flatMap { p =>
          p.getFileName.toString match {
            case rx(t0) => Some((t0.toLong, p))
            case _ => None
          }
        }.toSeq
        finally listed.close()
      files.sortBy(-_._1).take(MaxBandRefs).flatMap(f => eligibleRun(f._2))
    }
    eligibleRun(dir.resolve("BENCH_LOCAL.json")).toSeq ++
      driverPath.flatMap(eligibleRun).toSeq ++ sidecars
  }

  /** The sf label of a bench snapshot: quoted-string form first (the
    * sidecar's `"sf":"sf0.1"` — and NON-NUMERIC labels like the sf1
    * sweep's `"graft_sf1"`, which the previous `[0-9.]+`-only pattern
    * could never match, so a run from a non-`sfN`-named dir was blocked
    * as "different sf" even against its OWN reference and sidecar'd
    * forever — r15 ADVICE), then the driver snapshot's bare-number form
    * (`"sf": 0.1`). The driver file embeds an ESCAPED copy of the
    * stdout line in its "tail" string, but `\"sf\":` never matches a
    * pattern anchored on an unescaped quote, so the real field wins.
    */
  def sfLabelOf(json: String): Option[String] =
    """"sf":\s*"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))
      .orElse(""""sf":\s*([0-9][0-9.eE+-]*)""".r.findFirstMatchIn(json).map(_.group(1)))

  /** Label equality up to the optional `sf` dir-name prefix — `sf0.1`,
    * `0.1` and `"0.1"` all name the same scale; `graft_sf1` only
    * matches itself.
    */
  def sameSfLabel(a: String, b: String): Boolean =
    a.stripPrefix("sf") == b.stripPrefix("sf")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the machine's actual width: every scale probe runs at 32
    // and a "4" fallback here produced a 2-4x-inflated mid-session
    // snapshot once (see 4ee578c) — the env var stays for pinning runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // non-AQE-fallback width defaults to cpus; the real sizing is AQE's
    // initialPartitionNum (GraftSession): start wide, coalesce to actual
    // bytes — the engine default that keeps sf10 sorts in memory
    // (see SCALE.md's j4 and jaccard findings)
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTITIONS", cpus)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      parts.toInt,
      initialPartitions = math.max(parts.toInt, GraftSession.DefaultInitialPartitions)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // TWO re-measure references, merged by per-query MIN: the previous
    // committed local sidecar AND the newest driver snapshot
    // (BENCH_r*.json). The latch (BenchRegressionSpec) fails against
    // the DRIVER snapshot, so flagging only against the local sidecar
    // let a latch-relevant drift ship without its in-artifact
    // re-measure (r11: x_ann_ivfpq tripped the latch at 1.51x vs r10
    // while reading under 1.5x vs the fresher local ref). Min-ref
    // flagging re-measures a superset of anything the latch can fail
    // on. References at a different sf than this run are skipped; a
    // missing/unparseable file just disables its half (first run).
    // parse failures must not be SILENT: a reference that half-parses to
    // empty disables flagging with no signal — the fail-open posture that
    // previously let drifts ship unarbitrated (r11 ADVICE). A file that
    // exists at the SAME sf but yields no query times gets a stderr
    // warning AND a ref-parse marker in the JSON errors array.
    val refWarnings = scala.collection.mutable.LinkedHashSet[String]()
    val (refTimes: Map[String, Double], bandTh: Map[String, Double]) = try {
      val sfWanted = sfDir.split('/').last
      def parseRef(p: java.nio.file.Path): Map[String, Double] = {
        if (!java.nio.file.Files.exists(p)) return Map.empty
        val s = java.nio.file.Files.readString(p)
        val sfOk = sfLabelOf(s).exists(sameSfLabel(_, sfWanted))
        if (!sfOk) return Map.empty // different sf: legitimately unusable
        val parsed = parseQueryTimes(s)
        if (parsed.isEmpty) {
          val w = s"ref-parse-empty:${p.getFileName}"
          refWarnings += w
          System.err.println(s"WARN Bench: reference $p exists at sf=$sfWanted " +
            "but parsed to zero query times — its flagging half is disabled")
        }
        parsed
      }
      val local = parseRef(java.nio.file.Paths.get("BENCH_LOCAL.json"))
      val driverPath = (1 to 99).map(n => java.nio.file.Paths.get(f"BENCH_r$n%02d.json"))
        .filter(java.nio.file.Files.exists(_)).lastOption
      val driver = driverPath.map(parseRef).getOrElse(Map.empty)
      // REFERENCE-BAND sources (see [[bandThreshold]]): the committed
      // reference + newest driver snapshot (both already parsed above)
      // plus the ≤MaxBandRefs most recent clean same-sf full-run
      // sidecars (BENCH_LOCAL.<t0>.json — gitignored, so the band is a
      // per-host memory of its own clean windows)
      val bandRuns = bandRunsIn(java.nio.file.Paths.get("."), sfWanted)
      val ref = (local.keySet ++ driver.keySet).map { k =>
        k -> math.min(local.getOrElse(k, Double.MaxValue),
          driver.getOrElse(k, Double.MaxValue))
      }.toMap
      (ref, bandThresholds(bandRuns))
    } catch {
      case e: Throwable =>
        refWarnings += s"ref-parse-error:${e.getClass.getSimpleName}"
        System.err.println(s"WARN Bench: reference parsing failed ($e) — " +
          "flagging disabled this run")
        (Map.empty[String, Double], Map.empty[String, Double])
    }

    // warmup: touch every table once (schema + full scan) + JIT the agg path
    // (events is warmed via Tables.events below — a plain read would hit
    // the TIMESTAMP(NANOS) rejection and spew an aborted-job stack trace)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }

    // min of N reps per query: steadier numbers under ambient load
    // (measured same-code totals swing 30.8-43.9 s with 2 reps; 3 reps
    // tightens the min at ~1 min extra wall time for the whole suite)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // a failed query must not masquerade as a fast one — collect errors,
    // surface them in the JSON, and drop failed reps entirely: a failing
    // rep's (fast) latency would otherwise shrink times.min and the total
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    errors ++= refWarnings // surfaced in the JSON, not just stderr
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 isolates queries for profiling runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // SPARK_GRAFT_BENCH_DIAG=1: per-query storage snapshot on stderr —
    // leak hunting (is cross-query contamination block/broadcast/disk
    // accumulation?), excluded from the timed sections
    val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").contains("1")
    val suiteT0 = System.currentTimeMillis()
    def measureOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      // noop sink, not count(): under count() Catalyst prunes every
      // projection to nothing, so expression-heavy scan queries would
      // time as bare scans; the noop sink materializes every column.
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => errors += name; None }
      finally {
        // drop storage blocks a query left behind (e.g. the final
        // round's checkpoint in the resolution loops): with a big heap
        // the async ContextCleaner may never run, and accumulated dead
        // blocks degrade every LATER query — cross-query contamination,
        // not real per-query cost (measured 3-30× at sf1)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    // WINDOW-QUALITY CANARY (r14 VERDICT #1): min-of-2 reps of each
    // canary query before and after the suite; the JSON then carries
    // its own window arbitration (thresholds documented on
    // [[CanaryThresholds]] and in SCALE.md). Min-of-2, not one shot:
    // the pre-suite rep is the query's first execution and a cold-JIT
    // first shot measured 4.2 s on a host whose second rep read 1.7 s —
    // a single cold sample would misclassify clean windows, while real
    // degradation (hypervisor contention) inflates EVERY rep. ~8 s per
    // side clean; SPARK_GRAFT_BENCH_CANARY=0 disables (profiling loops).
    val canaryOn = !sys.env.get("SPARK_GRAFT_BENCH_CANARY").contains("0")
    def runCanary(tag: String): Seq[(String, Double)] =
      if (!canaryOn) Nil
      else CanaryThresholds.map(_._1).flatMap { q =>
        SparkEntry.queries.get(q).flatMap { fn =>
          (1 to 2).flatMap(_ => measureOnce(s"canary_$tag:$q", fn))
            .minOption.map(q -> _)
        }
      }
    val canaryPre = runCanary("pre")
    // per-query record: (min seconds, wall-clock start/end epoch ms
    // spanning ALL reps) — the stamps are the burst-window evidence
    val results = selected.map { case (name, fn) =>
      val w0 = System.currentTimeMillis()
      val times = (1 to reps).flatMap(_ => measureOnce(name, fn))
      val w1 = System.currentTimeMillis()
      if (diag) System.err.println(
        f"DIAG $name min=${times.minOption.getOrElse(Double.NaN)}%.2f " +
          org.apache.spark.sql.graft.shims.storageDiag(spark.sparkContext))
      (name, times.minOption, w0, w1)
    }
    // errored-out queries print as null (JSON-safe) and are excluded
    // from the total; the errors array is the visibility signal.
    // Centisecond precision with trailing zeros stripped, deliberately:
    // the harness keeps only a 2000-char tail of stdout, and
    // full-precision doubles pushed the line past it at ~70 queries
    // (BENCH_r03/r04 "parsed": null) — sub-10ms digits are noise at
    // these runtimes anyway.
    def fmt(v: Double): String = {
      val s = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t + "0" else t
    }
    val total = results.flatMap(_._2).sum
    val sfLabel = sfDir.split('/').last
    // stored-index build/probe split (r7 VERDICT #2): the combined
    // numbers above stay the honest oracle-shaped cost; this pass
    // measures what a warehouse actually pays per refresh — build once,
    // then min-of-reps probes against the standing index. Builds are
    // now ALSO min-of-reps (r9 VERDICT #4: the one-sample weighted-walk
    // build carried a known 5x burst into the committed artifact).
    val splits = queries.StoredSplits.splits.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) &&
        SparkEntry.queries.contains(n) }
      .flatMap { case (name, (build, probe)) =>
        try {
          val buildS = (1 to reps).map { _ =>
            val b0 = System.nanoTime()
            build(spark, sfDir)
            val dt = (System.nanoTime() - b0) / 1e9
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
            dt
          }.min
          val probeS = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            probe(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
            dt
          }.min
          Some(name -> (buildS, probeS))
        } catch { case _: Throwable => errors += s"split:$name"; None }
      }
    // END-OF-SUITE ISOLATED RE-MEASURE of flagged queries: fresh min
    // > the query's BAND threshold x the committed time AND
    // >FlagAbsSeconds over it — the SAME rule BenchRegressionSpec
    // latches on (shared [[bandThreshold]] over the same snapshot set),
    // so every latch-relevant drift carries its own in-artifact
    // arbitration. Runs nothing when no reference exists; capped at 12
    // (worst excess first) so a systemically-slow host can't double the
    // suite.
    val flagged = results.collect {
      case (name, Some(now), _, _) if refTimes.get(name).exists { ref =>
        now > ref * bandTh.getOrElse(name, FlagRatio) &&
          now - ref > FlagAbsSeconds
      } => (name, now, refTimes(name))
    }.sortBy { case (_, now, ref) => ref - now }.take(12)
    val remeasures = flagged.flatMap { case (name, _, _) =>
      selected.find(_._1 == name).map { case (_, fn) =>
        val w0 = System.currentTimeMillis()
        // min-of-3, not min-of-1: one isolated sample can't distinguish
        // a burst that spans suite end from genuine code drift
        val re = (1 to 3).flatMap(_ => measureOnce(name, fn)).minOption
        name -> (re, w0, System.currentTimeMillis())
      }
    }.toMap
    // the post-suite canary catches degradation that BEGAN mid-suite
    // (the pre-suite sample alone would read clean over an r14-style
    // window that decayed after launch)
    val canaryPost = runCanary("post")
    // thresholds are calibrated at one sf; elsewhere the canary's raw
    // seconds are still emitted but never classified (CanaryCalibratedSf)
    val quality = classifyWindow(sfLabel, canaryPre ++ canaryPost)
    // uniform-slowdown arbitration (see [[medianRatio]]): only
    // meaningful on a full run — an ONLY-filtered handful is exactly
    // the sample a regression CAN move, so partial runs omit the field
    val medianVsRef: Option[Double] =
      if (only.isDefined) None
      else medianRatio(results.collect {
        case (name, Some(now), _, _) if refTimes.get(name).exists(_ > 0) =>
          now / refTimes(name)
      })
    def canarySide(s: Seq[(String, Double)]): String =
      s.map { case (q, v) => "\"" + q + "\":" + fmt(v) }.mkString("{", ",", "}")
    val suiteT1 = System.currentTimeMillis()
    def offs(ms: Long): Long = (ms - suiteT0) / 1000
    // flagged-block JSON: ref = committed time, min = this suite's
    // min-of-reps, w = [start,end] offsets (s) of the in-suite window,
    // re = the isolated end-of-suite re-measure (null = it errored),
    // th = the band threshold this flag cleared (1.5 = point-reference
    // degenerate band — new query or fresh clone)
    val flaggedJson = flagged.map { case (name, now, ref) =>
      val (re, r0, r1) = remeasures.getOrElse(name, (None, suiteT1, suiteT1))
      val (q0, q1) = results.find(_._1 == name)
        .map(r => (r._3, r._4)).getOrElse((suiteT0, suiteT0))
      "\"" + name + s"""\":{"ref":${fmt(ref)},"min":${fmt(now)},"w":[${offs(q0)},${offs(q1)}],"re":${re.fold("null")(fmt)},"rw":[${offs(r0)},${offs(r1)}],"th":${fmt(bandTh.getOrElse(name, FlagRatio))}}"""
    }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val canaryJson =
      s"""{"pre":${canarySide(canaryPre)},"post":${canarySide(canaryPost)}}"""
    // a BENCH_ONLY-filtered run must not clobber the committed full
    // snapshot (BenchRegressionSpec reads it; a 2-query file canceled
    // the latch and cost a full re-run this round) — sidecar it. A FULL
    // run earns the reference slot only by beating the standing total
    // at the same sf (r14 VERDICT #5: three driver round-close runs
    // overwrote the idle reference with busy-host copies); slower runs
    // land in a timestamped side file, SPARK_GRAFT_BENCH_COMMIT_REF=1
    // forces the slot (legitimate registry/protocol changes).
    val snapshotName =
      if (only.isDefined) "BENCH_LOCAL_partial.json"
      else {
        val force = sys.env.get("SPARK_GRAFT_BENCH_COMMIT_REF").contains("1")
        val refPath = java.nio.file.Paths.get("BENCH_LOCAL.json")
        // (sameSf, total) of the standing reference; a missing or
        // unparseable file yields (true, None) — nothing stands, the
        // run takes the slot. A reference at a DIFFERENT sf blocks
        // unforced (totals aren't comparable across sf — see
        // [[mayOverwriteReference]]; the first spelling let an sf1
        // sweep clobber the committed sf0.1 reference).
        val (refSameSf, existingTotal): (Boolean, Option[Double]) =
          if (!java.nio.file.Files.exists(refPath)) (true, None)
          else try {
            val s = java.nio.file.Files.readString(refPath)
            val sameSf = sfLabelOf(s).exists(sameSfLabel(_, sfLabel))
            (sameSf, if (!sameSf) None
             else """"total":\s*([0-9][0-9.eE+-]*)""".r
               .findFirstMatchIn(s).map(_.group(1).toDouble))
          } catch { case _: Exception => (true, None) }
        if (mayOverwriteReference(existingTotal, total, force, refSameSf))
          "BENCH_LOCAL.json"
        else {
          val side = s"BENCH_LOCAL.$suiteT0.json"
          val why =
            if (!refSameSf) s"is at a different sf than this run ($sfLabel)"
            else f"(${existingTotal.get}%.2f s) beats this run (${total}%.2f s)"
          System.err.println(s"WARN Bench: standing BENCH_LOCAL.json $why " +
            s"— reference kept, snapshot -> $side " +
            "(SPARK_GRAFT_BENCH_COMMIT_REF=1 to force)")
          side
        }
      }
    def render(es: Seq[(String, Option[Double])], omitted: Int): String = {
      val qs = es.map { case (k, v) => "\"" + k + "\":" + v.fold("null")(fmt) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      val fl = if (flagged.nonEmpty) s""","flagged":$flaggedJson""" else ""
      val mr = medianVsRef.fold("")(v => s""","median_vs_ref":${fmt(v)}""")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$om$fl,"errors":$errs,"canary":$canaryJson,"window_quality":"$quality"$mr,"snapshot":"$snapshotName","sf":"$sfLabel","t0":$suiteT0,"t1":$suiteT1}"""
    }
    // full-precision sidecar: the complete per-query record lives in the
    // repo regardless of what fits on the stdout line
    val splitJson = splits
      .map { case (k, (b, p)) => "\"" + k + s"""\":{"build":$b,"probe":$p}""" }
      .mkString("{", ",", "}")
    val stampsJson = results
      .map { case (k, _, w0, w1) => "\"" + k + s"""\":[$w0,$w1]""" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(snapshotName),
      results.map { case (k, v, _, _) => "\"" + k + "\":" + v.fold("null")(_.toString) }
        .mkString(s"""{"total":$total,"sf":"$sfLabel","t0":$suiteT0,"t1":$suiteT1,"canary":$canaryJson,"window_quality":"$quality"${medianVsRef.fold("")(v => s""","median_vs_ref":$v""")},"queries":{""", ",",
          s"""},"stamps":$stampsJson,"flagged":$flaggedJson,"stored_splits":$splitJson}\n""")
        .getBytes("UTF-8"))
    // if the line would overflow the tail window, shed the CHEAPEST
    // entries (least informative per char) and say how many were dropped
    var kept = results.map(r => (r._1, r._2))
    var line = render(kept, 0)
    while (line.length > 1900 && kept.exists(_._2.isDefined)) {
      val cheapest = kept.filter(_._2.isDefined).minBy(_._2.get)._1
      kept = kept.filterNot(_._1 == cheapest)
      line = render(kept, results.size - kept.size)
    }
    println(line)
    spark.stop()
  }
}
