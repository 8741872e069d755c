package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** ONE parallelism default for every measurement harness (Bench, its
    * sf1 child, Verify, ScaleCheck, BoundedHeapProbe): 32, matching the
    * driver's local[32] contract. r16's split defaults (Bench/Verify 4 vs
    * ScaleCheck 32) made the recorded sf1 anchor a 4-core artifact — dd02
    * read 26.3s where the same plan costs 5.1s at local[32] — and
    * invalidated every cross-harness compare. Override via
    * SPARK_GRAFT_CPUS; whatever the value, [[planeExtra]] stamps it into
    * every emitted JSON line so each number says what plane it certifies. */
  private[graft] def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** The plane fields every bench JSON line carries (the r16 verdict's
    * fix): a number without its master/shuffle-partitions context cannot
    * be compared across harnesses or rounds. */
  private[graft] def planeExtra(cpus: String): String =
    s""""master":"local[$cpus]","shuffle_partitions":$cpus,"""

  /** One measured pass over `names` at `sfDir`: min-over-interleaved-reps
    * per query plus the calibration-anchor stats for the pass window. */
  private[graft] case class Pass(
      results: Seq[(String, Double, Double)], // (name, bestSec, spread)
      reps: Int, sfDir: String,
      aMin: Double, aMax: Double, aSpread: Double,
      extraReps: Int = 0) // adaptive re-reps spent on high-spread queries

  /** The sf1 headline subset: the queries whose cost is shuffle/scale
    * dominated enough that a 10x-data anchor can catch what sf0.1 constant
    * factors hide. mm06 (not the superseded toy mm05) represents the
    * perceptual-dedup family. */
  private[graft] val Sf1Headline = Seq("q01", "q12", "dd02", "dd03", "dd09",
    "dd10", "dd12", "ss01", "ss07", "ss10", "pp01", "tx09", "dl09", "mm06")

  /** Above this anchor spread a measurement window is machine-noise
    * polluted (the documented "discount this run" threshold) — the record
    * now DEFENDS itself (r18 verdict #1): a polluted pass is retried up to
    * [[anchorRetries]] times keeping the healthiest window, and a record
    * that stays polluted carries `"anchor_polluted":true` so neither
    * builder nor judge can read its values as plan cost. */
  private[graft] val AnchorSpreadGate = 1.5

  private[graft] def anchorRetries: Int =
    sys.env.getOrElse("SPARK_GRAFT_ANCHOR_RETRIES", "2").toInt

  /** Merge per-query results across repeated passes: machine noise can
    * only INFLATE a timing, never deflate it, so each query's cost is the
    * min across passes (keeping that attempt's spread); a query crashed in
    * every pass stays -1. The anchor stats come from the HEALTHIEST pass —
    * the window whose machine state the surviving minima are closest to. */
  private[graft] def mergePasses(passes: Seq[Pass]): Pass = {
    require(passes.nonEmpty, "mergePasses needs at least one pass")
    if (passes.size == 1) return passes.head
    val byName = passes.map(_.results.map(r => r._1 -> r).toMap)
    val merged = passes.head.results.map(_._1).map { n =>
      val ok = byName.flatMap(_.get(n)).filter(_._2 >= 0)
      if (ok.isEmpty) (n, -1.0, 1.0) else ok.minBy(_._2)
    }
    val healthiest = passes.filter(_.aSpread > 0)
      .minByOption(_.aSpread).getOrElse(passes.head)
    Pass(merged, passes.head.reps, passes.head.sfDir,
      healthiest.aMin, healthiest.aMax, healthiest.aSpread,
      passes.map(_.extraReps).sum)
  }

  /** One sf1 child's result; `best`/`anchor` merge across retries by min
    * (noise only inflates), `spread` follows whichever attempt won. */
  private[graft] case class ChildRes(
      name: String, best: Double, spread: Double, anchor: Double)

  /** Line 2 (the full-precision sf1 record) re-parsed for the final
    * line's embedded summary: totals, window stats, both pollution
    * markers, and the per-headliner values. */
  private[graft] case class Sf1Summary(
      total: Double, aSpread: Double, reps: Int, polluted: Boolean,
      qPolluted: Seq[String], qs: Seq[(String, Double)])

  private[graft] def combineChild(prev: ChildRes, next: ChildRes): ChildRes = {
    val best =
      if (prev.best < 0) next.best
      else if (next.best < 0) prev.best
      else math.min(prev.best, next.best)
    val spread =
      if (next.best >= 0 && (prev.best < 0 || next.best <= prev.best)) next.spread
      else prev.spread
    val anchor =
      if (prev.anchor <= 0) next.anchor
      else if (next.anchor <= 0) prev.anchor
      else math.min(prev.anchor, next.anchor)
    ChildRes(prev.name, best, spread, anchor)
  }

  /** A child is re-run when its window was unhealthy relative to the best
    * window seen (its anchor >gate× the min), its anchor is missing, or
    * its query crashed. */
  private[graft] def childNeedsRetry(c: ChildRes, minAnchor: Double): Boolean =
    c.best < 0 || c.anchor <= 0 ||
      (minAnchor > 0 && c.anchor > AnchorSpreadGate * minAnchor)

  /** The sf1 record binds per QUERY, not just per window (r19 verdict #1):
    * r19's window-level anchor gate passed at spread 1.483 while dd12
    * recorded 20.3s = 2.88× its committed isolated comparable — a trivial
    * scan-agg anchor's spread does not index the variance of a 20s
    * shuffle-heavy query. So after the window gate, every headliner is
    * compared against the committed same-plane comparable
    * (SCALECHECK.json `sf1_isolated.queries`, measured by the SAME
    * BenchSf1QueryChild entry) and re-run ALONE while it exceeds this
    * gate; a survivor is stamped `"q_polluted":[...]` so one noisy query
    * can never poison the record's per-query readability. */
  private[graft] val QueryVsComparableGate = 1.5

  /** True when the child's best exceeds the gate × its committed isolated
    * comparable. No comparable (new query, missing artifact) = not
    * gateable = never flagged: the gate must not invent pollution where
    * the done-bar is undecidable. */
  private[graft] def queryExceedsComparable(
      c: ChildRes, comparables: Map[String, Double]): Boolean =
    c.best > 0 && comparables.get(c.name).exists(iso =>
      iso > 0 && c.best > QueryVsComparableGate * iso)

  /** `"q_polluted":["dd12"],` fragment — empty when nothing survived the
    * per-query gate. Load-bearing (it is what forbids reading a stamped
    * query's value as plan cost), so it rides EVERY emission rung. */
  private[graft] def qPollutedFrag(names: Seq[String]): String =
    if (names.isEmpty) ""
    else names.map("\"" + _ + "\"").mkString(""""q_polluted":[""", ",", "],")

  /** Committed per-query sf1 comparables: SCALECHECK.json's
    * `sf1_isolated.queries` (full query names → isolated seconds).
    * Missing file / node / unparseable = empty map (gate disabled, never
    * a crash — the bench record must still emit on a fresh checkout). */
  private[graft] def sf1Comparables(
      path: String = sys.env.getOrElse("SPARK_GRAFT_SCALECHECK", "SCALECHECK.json"))
      : Map[String, Double] =
    try {
      val f = new java.io.File(path)
      if (!f.isFile) Map.empty
      else {
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        val qs = n.path("sf1_isolated").path("queries")
        val b = Map.newBuilder[String, Double]
        val it = qs.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.asDouble() > 0) b += e.getKey -> e.getValue.asDouble()
        }
        b.result()
      }
    } catch { case _: Exception => Map.empty }

  private[graft] def runPass(
      spark: SparkSession, sfDir: String,
      names: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      reps: Int, dropFirstAnchor: Boolean = true): Pass = {
    def anchorProbe(): Unit = {
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      l.filter(l("l_quantity") > 0).groupBy("l_returnflag").count().collect()
      ()
    }
    // untimed warmup: JVM/codegen/parquet-footer costs otherwise land on
    // whichever query happens to run first (measured ~5s of noise)
    try anchorProbe() catch { case _: Throwable => () }
    // calibration anchor: the SAME fixed trivial probe timed between
    // passes. Its spread is a machine-health signal the per-query numbers
    // can't provide — min-over-interleaved-passes defends against a slow
    // window inside the run, but not against interference spanning the
    // WHOLE run (r12 recorded phantom 4x regressions on byte-unchanged
    // queries that way). A polluted run now self-identifies: anchor_spread
    // far above 1 ⇒ discount this bench, re-run on a quiet machine.
    val anchorTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def timeAnchor(): Unit = {
      // level the GC field first: without this a sample right after a
      // heap-churning pass pays the previous pass's collection backlog,
      // which reads as "interference" when it's really the neighbor query
      System.gc()
      // each sample is a min-of-3: a single ~0.2s probe is scheduler-noise
      // dominated (measured spread 2.4x on a healthy machine); min-of-3
      // keeps a sample cheap while making spread>~1.5 actually mean
      // sustained interference, not one unlucky quantum
      val sample = (0 until 3).flatMap { _ =>
        val t0 = System.nanoTime()
        try { anchorProbe(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      if (sample.nonEmpty) anchorTimes += sample.min
    }
    // min over N INTERLEAVED full passes (default 3): r8 proved median of
    // consecutive reps doesn't defend against sustained interference — all
    // three reps of a query can sit inside the same slow window (q33 recorded
    // 75s, reproduced at 1s). Interleaving puts each query's reps minutes
    // apart, and min is the right estimator for "what the code costs":
    // machine noise can only inflate a timing, never deflate it.
    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (0 until reps).foreach { _ =>
      timeAnchor()
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink: executes the FULL plan (count() would let Catalyst
        // prune projected expressions and under-measure expression-heavy
        // queries)
        val t =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
          }
        timings(name) = timings(name) :+ t
        // per-query cache hygiene: dd/ss/pp persists would otherwise pile
        // up evicted-but-pinned blocks across reps × 150+ queries, adding
        // memory pressure exactly where interference noise is measured
        graft.operators.QueryCaches.release()
      }
    }
    timeAnchor()
    // adaptive re-reps (r19 verdict #4): a query whose in-pass spread
    // exceeds ~3x has a min that is one lucky sample deep (dd12 recorded
    // spread 8.94 at reps=3 — two worn samples and one real one). Extra
    // reps deepen the min's support for exactly the queries whose
    // readability is at risk, at a cost bounded by MaxSamples. The
    // emitted spread keeps ALL samples (max/min — the interference signal
    // must not be laundered away); `extra_reps` on the emitted line says
    // the insurance ran.
    val RepSpreadGate = 3.0
    val MaxSamples = 6
    // the ratio alone fires on sub-second scheduler jitter (a 0.1s query
    // reading 0.05/0.2s is a 4x "spread" worth nothing) — the absolute
    // guard targets the actual defect class: multi-second divergence on
    // a heavy query, where one worn sample distorts the record
    val RepDivergenceFloorSec = 1.0
    var extraReps = 0
    names.foreach { case (name, fn) =>
      var ts = timings(name)
      var broken = false
      while (!broken && ts.size >= 2 && !ts.exists(_ < 0) &&
          ts.size < MaxSamples &&
          ts.max - ts.min > RepDivergenceFloorSec &&
          ts.max / math.max(ts.min, 1e-9) > RepSpreadGate) {
        System.gc()
        val t0 = System.nanoTime()
        val t =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            // a transient extra-rep failure must not erase a query that
            // already completed every MAIN rep — stop deepening, keep
            // the valid samples (the main loop's crash-marks-broken rule
            // is for queries that never proved they run)
            System.err.println(s"[bench] $name extra rep failed: ${e.getMessage}")
            broken = true
            -1.0
          }
        graft.operators.QueryCaches.release()
        if (!broken) { ts = ts :+ t; extraReps += 1 }
      }
      timings(name) = ts
    }
    val results = names.map { case (name, _) =>
      val times = timings(name)
      // any crashed rep records -1, never a (tiny) elapsed time — a broken
      // query must not masquerade as a fast one in bench compares
      val best =
        if (times.exists(_ < 0)) -1.0
        else times.min
      val spread =
        if (best < 0 || times.size < 2) 1.0
        else times.max / math.max(times.min, 1e-9)
      (name, best, spread)
    }
    // spread compares LIKE samples: the first anchor runs in a near-fresh
    // JVM (small heap, cold codegen caches, no pinned broadcast blocks)
    // and is SYSTEMATICALLY the fastest — r14 measured 0.12s first vs
    // 0.26-0.34s for every steady-state sample on an idle machine, a
    // phantom 2.9x "spread" that would discount a perfectly clean run.
    // So the interference signal uses steady-state samples only (drop the
    // pre-pass one); machine interference inflates SOME steady sample
    // relative to the others, which is exactly what max/min then catches.
    // (second and later passes run in an already-warm JVM: their first
    // sample is a valid steady-state one, so callers keep it — dropping
    // it there would leave a 2-sample spread, all noise)
    val steady =
      if (dropFirstAnchor && anchorTimes.size >= 2) anchorTimes.drop(1).toSeq
      else anchorTimes.toSeq
    val (aMin, aMax) = if (steady.isEmpty) (-1.0, -1.0) else (steady.min, steady.max)
    val aSpread = if (aMin <= 0) -1.0 else aMax / math.max(aMin, 1e-9)
    Pass(results, reps, sfDir, aMin, aMax, aSpread, extraReps)
  }

  private[graft] def ms(v: Double): String =
    if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  private[graft] def ms1(v: Double): String =
    if (v < 0) "-1" else BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString

  /** JSON line for one pass; `scale` sets the queries-map precision
    * (negative = omit the per-query map, header stats kept); `extra` is
    * an optional pre-rendered `"key":value,` fragment spliced before the
    * trailing "sf" field. */
  private[graft] def lineOf(p: Pass, scale: Int, extra: String = "",
      compactHeader: Boolean = false): String =
    render(p, s""""queries":${secondsMap(p, scale)},""", extra, compactHeader)

  private def secondsMap(p: Pass, scale: Int): String =
    if (scale < 0) "{}" else p.results.map { case (k, v, _) =>
      val s = if (v < 0) "-1" else {
        // trim trailing zeros ("3.40"→"3.4", "2.00"→"2") — with 150+ queries
        // every byte of the final line counts against the capture window
        val r = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
        if (r.contains('.')) r.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else r
      }
      "\"" + k.takeWhile(_ != '_') + "\":" + s
    }.mkString("{", ",", "}")

  /** Decisecond integer map fragment: "dd2":42 = dd02 took 4.2s; crashed
    * reps stay -1. ~9 chars/entry keeps all 160+ queries inside the tail
    * budget at the 0.1s precision the cross-round compare actually uses. */
  private[graft] def dsMapOf(p: Pass): String = p.results.map { case (k, v, _) =>
    val ds = if (v < 0) -1L else math.round(v * 10)
    "\"" + shortKey(k) + "\":" + ds
  }.mkString(""""q_unit":"ds","queries_ds":{""", ",", "},")

  /** ds-map key shortening: family prefix with the index's leading zeros
    * stripped (unambiguous: no family has both "x1" and "x01") — with 160+
    * entries each saved byte matters. Shared with BenchEmissionSuite's
    * uniqueness pin so production and test cannot drift apart. */
  private val ZeroPad = "([a-z]+)0+([1-9][0-9]*)".r
  private[graft] def shortKey(name: String): String =
    name.takeWhile(_ != '_') match {
      case ZeroPad(fam, idx) => fam + idx
      case other => other
    }

  /** Shared line skeleton: header stats + a pre-rendered queries fragment
    * (seconds map OR ds map — STRUCTURAL, never post-hoc string surgery on
    * a rendered line) + `extra` + the sf tail. `compactHeader` (the
    * final-line rungs) drops the pure-diagnostic stats — spread_med and
    * the anchor min/max behind anchor_spread — buying ~58 chars of tail
    * budget for the all-headliner sf1 map (r19 verdict #2) while keeping
    * every load-bearing field: spread_max + its query, anchor_spread,
    * and both pollution markers ride in `extra`. */
  private def render(p: Pass, qsFragment: String, extra: String,
      compactHeader: Boolean = false): String = {
    val ok = p.results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val failed = p.results.count(_._2 < 0)
    val spreads = ok.map(_._3)
    val spreadMax = if (spreads.isEmpty) 1.0 else spreads.max
    val spreadQ = ok.sortBy(-_._3).headOption
      .map(_._1.takeWhile(_ != '_')).getOrElse("")
    val spreadMed = if (spreads.isEmpty) 1.0 else spreads.sorted.apply(spreads.size / 2)
    // "unit":"sec" is a constant the full-precision lines keep for human
    // readers; on the budgeted final line it is 13 dead chars
    val diag =
      if (compactHeader) ""
      else s""""unit":"sec","spread_med":${ms(spreadMed)},"anchor_min":${ms(p.aMin)},"anchor_max":${ms(p.aMax)},"""
    // compact total at 1 decimal: sub-decisecond digits are run noise at
    // 100+ second scale (the full-precision value stays on line 1).
    // "failed" rides EVERY rung — a crash count must never be absent.
    val totalStr = if (compactHeader) ms1(total) else ms(total)
    s"""{"metric":"total","value":$totalStr,"failed":$failed,"reps":${p.reps},"spread_max":${ms(spreadMax)},"spread_max_q":"$spreadQ",$diag"anchor_spread":${ms(p.aSpread)},$qsFragment$extra"sf":"${p.sfDir}"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // same engine surface as Verify (delta SQL parser + native functions)
      .config("spark.sql.extensions", classOf[graft.functions.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name-prefix filter for targeted local runs
    // (the driver never sets it, so driver benches always cover everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    // fixed name order within a pass: run-to-run comparable timings, and
    // queries sharing cached sub-plans (dd03/dd06/pp01's minhash pipeline)
    // warm predictably
    val names = selected.toSeq.sortBy(_._1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // anchor-gated record (r18 verdict #1): a polluted pass (anchor_spread
    // past the gate) is re-run up to anchorRetries times; the merged
    // record keeps each query's min and the healthiest window's anchors
    var passes = List(runPass(spark, sfDir, names, reps))
    def healthSpread: Double = {
      val s = passes.map(_.aSpread).filter(_ > 0)
      if (s.isEmpty) -1.0 else s.min
    }
    var mainRetries = 0
    while (healthSpread > AnchorSpreadGate && mainRetries < anchorRetries) {
      mainRetries += 1
      System.err.println(s"[bench] sf0.1 anchor_spread $healthSpread > " +
        s"$AnchorSpreadGate: machine-noise window — retry $mainRetries")
      // dropFirstAnchor=false: a retry pass runs in an already-warm JVM,
      // so its first anchor sample is valid steady state (the drop exists
      // only for the near-fresh-JVM systematic fast sample — see runPass)
      passes = passes :+ runPass(spark, sfDir, names, reps, dropFirstAnchor = false)
    }
    val main = mergePasses(passes)
    val mainPolluted = main.aSpread > AnchorSpreadGate
    // line 1 (full precision, kept in logs) carries the retry count and
    // the pollution marker; the tail-budgeted FINAL line carries only the
    // load-bearing marker — "anchor_polluted":true is what forbids reading
    // the values as plan cost, while the retry count is diagnostics (43
    // chars of it would push the worst-case ds rung past the tail budget)
    val healthFull = s""""anchor_retries":$mainRetries,""" +
      s""""extra_reps":${main.extraReps},""" +
      (if (mainPolluted) """"anchor_polluted":true,""" else "")
    // extra_reps rides the compact line only when the insurance actually
    // ran (r19 verdict #4's done-bar: a high-spread min is either deepened
    // or the record says it wasn't) — zero would be 16 dead chars of tail
    val healthCompact =
      (if (main.extraReps > 0) s""""extra_reps":${main.extraReps},""" else "") +
        (if (mainPolluted) """"anchor_polluted":true,""" else "")

    // ---- second anchor at ~sf1 (10× data), ONE FRESH CHILD JVM PER
    // QUERY: r15's in-context sf1 pass recorded dd02 at 32.6s where the
    // isolated run costs 4.2s (parent wear); r17's fix — one child for all
    // 14 headliners — recursed the same defect one level down: queries
    // late in the child's fixed order carried 3-4x within-child wear
    // (pp01 21.6s vs 6.2s isolated, tx09 8.8s vs 2.2s), and min-over-reps
    // cannot recover a plan cost when BOTH reps are worn. Per-query
    // isolation kills the defect class structurally: each headliner runs
    // in its own process with the exact measurement shape the SCALECHECK
    // isolated probes use (untimed warm pass, GC, min over reps), so the
    // RECORDED artifact and the isolated plane certify the same thing.
    // The derive stays in the parent (idempotent, reused by ScaleCheck).
    // Skipped for targeted local runs (SPARK_GRAFT_ONLY) or with
    // SPARK_GRAFT_SF1=0. Left(reason) = no sf1 pass, and WHY — the final
    // line carries the marker so a crashed anchor is distinguishable from
    // a disabled one (the r16 ADVICE: a silently-missing sf1 key blinded
    // cross-round compares to child-JVM failures).
    val sf1Line: Either[String, String] =
      if (only.nonEmpty) Left("targeted_run")
      else if (sys.env.get("SPARK_GRAFT_SF1").contains("0")) Left("disabled")
      else try {
        val workDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-scalecheck/sf1")
        ScaleCheck.generate(spark, sfDir, workDir, copies = 10)
        val reps = sys.env.getOrElse("SPARK_GRAFT_SF1_REPS", "2").toInt
        val all = SparkEntry.queries.keys.toSeq.sorted
        def runChild(name: String): ChildRes =
          sf1QueryChild(name, workDir, reps) match {
            case Right((best, spread, anchorSec)) =>
              ChildRes(name, best, spread, anchorSec)
            case Left(err) =>
              // one crashed child must not blind the other 13 headliners;
              // the -1 rides into the line's `failed` count
              System.err.println(s"[bench] sf1 child $name failed: $err")
              ChildRes(name, -1.0, 1.0, -1.0)
          }
        var results: Seq[ChildRes] = Sf1Headline.map { prefix =>
          val name = all.find(_.startsWith(prefix)).getOrElse(
            sys.error(s"no registered query with prefix $prefix"))
          runChild(name)
        }
        // cross-child anchor spread: each child samples the SAME trivial
        // probe in its own fresh JVM, so spread across children measures
        // machine health over the whole sf1 window (the per-pass
        // interference signal the single-child design got from
        // interleaving) — all samples are steady-state-comparable
        // (identical JVM age at sample time), so none is dropped.
        // ANCHOR-GATED (r18 verdict #1): children whose window was noisy
        // relative to the best window (or that crashed) are re-run up to
        // anchorRetries times; min-merge per child, pollution marker when
        // the final spread still exceeds the gate.
        def anchors = results.map(_.anchor).filter(_ > 0)
        def crossSpread = {
          val a = anchors
          if (a.isEmpty) -1.0 else a.max / math.max(a.min, 1e-9)
        }
        var sf1Retried = 0
        var tries = 0
        while (crossSpread > AnchorSpreadGate && tries < anchorRetries) {
          tries += 1
          val minA = anchors.min
          System.err.println(s"[bench] sf1 cross-child anchor_spread " +
            s"$crossSpread > $AnchorSpreadGate: re-running noisy children " +
            s"(round $tries)")
          results = results.map { r =>
            if (!childNeedsRetry(r, minA)) r
            else { sf1Retried += 1; combineChild(r, runChild(r.name)) }
          }
        }
        // per-QUERY gate against the committed comparables (r19 verdict
        // #1): the window gate above bounds the WINDOW's health via a
        // trivial anchor — it cannot see a 20s shuffle-heavy query
        // absorbing noise the anchor doesn't (r19: dd12 recorded 2.88×
        // its comparable under a passing window). Each headliner with a
        // committed SCALECHECK `sf1_isolated` value is re-run ALONE
        // while it exceeds [[QueryVsComparableGate]]× that value —
        // min-merge keeps the best attempt — and a survivor is stamped
        // `q_polluted` so the record stays readable query-by-query. Two
        // bounds: per-query [[anchorRetries]], plus a global cap so a
        // machine that is genuinely slower than the comparables' window
        // (every query over the gate) cannot balloon the bench run.
        val comparables = sf1Comparables()
        var qRetried = 0
        val qBudget = scala.collection.mutable.Map.empty[String, Int]
          .withDefaultValue(0)
        val qRetryCapTotal = math.max(6, anchorRetries * 3)
        var offending = results.filter(queryExceedsComparable(_, comparables))
        while (offending.exists(r => qBudget(r.name) < anchorRetries) &&
            qRetried < qRetryCapTotal) {
          results = results.map { r =>
            if (!offending.exists(_.name == r.name) ||
                qBudget(r.name) >= anchorRetries || qRetried >= qRetryCapTotal) r
            else {
              qBudget(r.name) += 1
              qRetried += 1
              System.err.println(s"[bench] sf1 ${r.name} ${ms(r.best)}s > " +
                s"$QueryVsComparableGate× its committed comparable " +
                s"${ms(comparables(r.name))}s — re-running that child alone " +
                s"(attempt ${qBudget(r.name)})")
              combineChild(r, runChild(r.name))
            }
          }
          offending = results.filter(queryExceedsComparable(_, comparables))
        }
        val qPolluted = offending.map(r => shortKey(r.name)).sorted
        val a = anchors
        val (aMin, aMax) = if (a.isEmpty) (-1.0, -1.0) else (a.min, a.max)
        val p = Pass(results.map(r => (r.name, r.best, r.spread)), reps, workDir,
          aMin, aMax, if (aMin <= 0) -1.0 else aMax / math.max(aMin, 1e-9))
        val sf1Health = s""""anchor_retried":$sf1Retried,"q_retried":$qRetried,""" +
          qPollutedFrag(qPolluted) +
          (if (p.aSpread > AnchorSpreadGate) """"anchor_polluted":true,""" else "")
        // "plane" says what this line certifies: one fresh process per
        // query — plan cost with NO within-child ordering wear (the r17
        // ambiguity) — at the stamped parallelism (the r16 ambiguity)
        Right(lineOf(p, 3,
          """"plane":"fresh_jvm_per_query",""" + sf1Health + planeExtra(cpus)))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 pass skipped: ${e.getMessage}")
        Left(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
      }

    // The driver records a 2000-char TAIL of stdout and sbt spends ~70 of
    // it (`[info] ` prefix + the trailing `[success] Total time` line), so
    // the LAST line must be a complete JSON object within ~1900 chars —
    // r13 lost a 2.3 KB line's head and blinded the perf gate; r15's
    // ladder bottomed out at `"queries":{}` and blinded per-query compare.
    // Emission contract: line 1 = full-precision sf0.1 JSON, line 2 =
    // full-precision sf1 JSON from the child (humans/logs — clipped from
    // the tail, fine); FINAL line = sf0.1 stats + per-query map + embedded
    // sf1 summary. 158 second-valued entries no longer fit, so the ladder
    // ends in a DECISECOND integer map (`"q_unit":"ds"`, value 42 = 4.2s)
    // — ~9 chars/entry keeps every query visible at the 0.1s precision the
    // cross-round compare actually uses.
    val plane = planeExtra(cpus)
    println(lineOf(main, 3, healthFull + plane))
    sf1Line.foreach(println)
    val sf1Parsed: Option[Sf1Summary] =
      sf1Line.toOption.flatMap { l =>
        try {
          val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
          val qs = Seq.newBuilder[(String, Double)]
          val it = n.path("queries").properties().iterator()
          while (it.hasNext) { val e = it.next(); qs += e.getKey -> e.getValue.asDouble() }
          val qp = Seq.newBuilder[String]
          val qpIt = n.path("q_polluted").elements()
          while (qpIt.hasNext) qp += qpIt.next().asText()
          Some(Sf1Summary(n.path("value").asDouble(), n.path("anchor_spread").asDouble(),
            n.path("reps").asInt(), n.path("anchor_polluted").asBoolean(false),
            qp.result(), qs.result()))
        } catch { case _: Exception => None }
      }
    println(finalLine(main, n => healthCompact + plane +
      sf1ExtraFor(sf1Parsed, sf1Line.left.getOrElse("unparseable child line"))(n)))
    // the TRUE final line: the driver-contract record (float-second
    // "queries" map). Kept leanest-possible so it always fits the tail
    // budget whole — a clipped head loses the entire parse (r13's lesson),
    // so the richer diagnostic rungs above stay on the penultimate line.
    val pollutedOnly = if (mainPolluted) """"anchor_polluted":true,""" else ""
    println(contractLine(main, {
      case -2 => pollutedOnly + plane
      case m => pollutedOnly + plane +
        sf1ExtraFor(sf1Parsed, sf1Line.left.getOrElse("unparseable child line"))(m)
    }))
    spark.stop()
  }

  /** The tail-budgeted final line: full seconds maps while they fit, then
    * the decisecond map, then summary-only — but NEVER an empty per-query
    * map while a ds map would fit (the r15 regression). Exposed for the
    * emission-contract spec. */
  /** The embedded sf1 fragment of the final line, by rung (r19 verdict
    * #2: the old top-6 seconds map left 8 of 14 headliner values
    * unrecorded — the 1.5× per-query done-bar was undecidable from
    * BENCH_r*.json alone):
    *   2  = full seconds map, ALL headliners
    *   1  = "sf1_ds" decisecond map, ALL headliners (the sf0.1 trick)
    *   0  = summary only (total + window stats)
    *   -1 = minimal (total; pollution markers still ride — they are
    *        load-bearing at EVERY rung)
    * `parsed` = None renders the explicit skip marker: a missing or
    * unparseable sf1 pass must be VISIBLE to the driver parse, never a
    * silently-absent key; every control char in the reason is scrubbed —
    * a tab in a Spark stack message would make the final line invalid
    * JSON and blind the whole perf gate. */
  private[graft] def sf1ExtraFor(
      parsed: Option[Sf1Summary], skipReason: => String)(mode: Int): String =
    parsed.map { s =>
      val pollutedPart = (if (s.polluted) """"anchor_polluted":true,""" else "") +
        qPollutedFrag(s.qPolluted)
      mode match {
        case 2 =>
          val qPart = s.qs.sortBy(-_._2).map { case (k, v) =>
            "\"" + k + "\":" + ms(v) }.mkString(""","queries":{""", ",", "}")
          s""""sf1":{$pollutedPart"total":${ms(s.total)},"anchor_spread":${ms(s.aSpread)},"reps":${s.reps}$qPart},"""
        case 1 =>
          val ds = s.qs.sortBy(_._1).map { case (k, v) =>
            "\"" + shortKey(k) + "\":" + (if (v < 0) -1L else math.round(v * 10))
          }.mkString("{", ",", "}")
          s""""sf1":{$pollutedPart"total":${ms(s.total)}},"sf1_ds":$ds,"""
        case 0 =>
          s""""sf1":{$pollutedPart"total":${ms(s.total)},"anchor_spread":${ms(s.aSpread)},"reps":${s.reps}},"""
        case _ =>
          s""""sf1":{$pollutedPart"total":${ms(s.total)}},"""
      }
    }.getOrElse {
      val reason = skipReason
        .map(c => if (c < ' ') ' ' else c)
        .replaceAll("[\"\\\\]", "'").take(60)
      s""""sf1":{"skipped":"$reason"},"""
    }

  /** The LAST stdout line, shaped exactly as the driver parses it (r21
    * verdict #2: `parsed: null` in every BENCH artifact since ~r14 — the
    * driver reads `"queries":{<q>: <float seconds>}` and never understood
    * the decisecond map, so PERF per_query/geomean/scaling ran blind for
    * seven rounds): `{"metric","value","unit":"sec","failed",` +
    * `"queries":{short-key: seconds},` + health/plane/sf1 extras + `"sf"}`.
    * Values are float SECONDS (1-decimal fits all 161 queries in the tail
    * budget; 2-decimal wins when the registry is filtered). The diagnostic
    * ladder line with `queries_ds` still prints immediately before this
    * one — continuity for the cross-round hand-parse — but the tail's
    * final line is now the driver-parsable record. `extra` is mode→
    * fragment like [[sf1ExtraFor]], with mode -2 = no sf1 block at all
    * (the last-resort rung; sf1 detail then lives only on lines 2-3). */
  private[graft] def contractLine(main: Pass, extra: Int => String): String = {
    val ok = main.results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val failed = main.results.count(_._2 < 0)
    def qm(scale: Int): String = main.results.map { case (k, v, _) =>
      val s = if (v < 0) "-1" else {
        val r = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
        if (r.contains('.')) r.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else r
      }
      "\"" + shortKey(k) + "\":" + s
    }.mkString("{", ",", "}")
    def line(scale: Int, mode: Int): String =
      s"""{"metric":"total","value":${ms1(total)},"unit":"sec","failed":$failed,""" +
        s""""queries":${qm(scale)},${extra(mode)}"sf":"${main.sfDir}"}"""
    Seq(line(2, 0), line(1, 0), line(1, -1), line(1, -2))
      .find(_.length <= TailBudget).getOrElse(line(1, -2))
  }

  private[graft] def finalLine(main: Pass, sf1Extra: Int => String): String = {
    // the ds rung is emitted STRUCTURALLY via render (r16 ADVICE: the old
    // string-replace of `"queries":{},` would turn into a silent no-op if
    // the empty-map rendering ever changed)
    def dsLine(extra: String): String =
      render(main, dsMapOf(main), extra, compactHeader = true)
    // the sf1 rung degrades full-seconds → deciseconds BEFORE dropping
    // values (r19 verdict #2: per-query sf1 visibility is part of the
    // record's contract, same as the main map's ds rung)
    val candidates =
      Seq(3, 2, 1).map(s =>
        lineOf(main, s, sf1Extra(2), compactHeader = true)) ++
        Seq(dsLine(sf1Extra(2)), dsLine(sf1Extra(1)), dsLine(sf1Extra(0)),
          dsLine(sf1Extra(-1)), lineOf(main, -1, sf1Extra(0), compactHeader = true))
    candidates.find(_.length <= TailBudget)
      .getOrElse(lineOf(main, -1, compactHeader = true))
  }

  /** Launch [[BenchSf1QueryChild]] for ONE headline query; parses its
    * `SF1Q <name> <bestSec> <spread> <anchorSec>` line. Mirrors the
    * parent's build.sbt -D surface (timezone above all: a child under the
    * machine-default zone would plan the timestamp-heavy headliners
    * differently than the sf0.1 pass). */
  private def sf1QueryChild(
      name: String, workDir: String, reps: Int): Either[String, (Double, Double, Double)] =
    try {
      val javaBin = s"${sys.props("java.home")}/bin/java"
      val cmd = Seq(javaBin) ++ JvmOpens.asArgv ++ Seq(
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-cp", sys.props("java.class.path"),
        "graft.BenchSf1QueryChild", name, workDir, reps.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val code = proc.waitFor()
      if (code != 0) Left(s"exit $code: " +
        out.linesIterator.toSeq.takeRight(5).mkString(" | "))
      else {
        // the per-stage locus line rides the round logs: when an attempt
        // reads hot relative to its comparable, stderr says WHICH stage
        // absorbed the window (r19 verdict #3)
        out.linesIterator.filter(_.startsWith("SF1STAGES "))
          .foreach(l => System.err.println(s"[bench] $l"))
        out.linesIterator.toSeq.reverse
          .collectFirst { case l if l.startsWith(s"SF1Q $name ") =>
            val parts = l.split(' ')
            (parts(2).toDouble, parts(3).toDouble, parts(4).toDouble)
          }
          .toRight(s"no SF1Q line from child $name")
      }
    } catch { case e: Throwable =>
      Left(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    }

  /** What survives of the driver's 2000-char stdout tail once sbt's
    * `[info] ` prefix and trailing `[success] Total time …` line are paid. */
  private[graft] val TailBudget = 1850
}

/** Child-JVM entry measuring ONE sf1 headline query in a fresh process —
  * the per-query isolation that kills within-child ordering wear (the r17
  * lesson: one child running all 14 headliners in fixed order taxed the
  * late-ordered ones 3-4x, so the recorded anchor certified JVM wear, not
  * plans). The measurement shape is EXACTLY the SCALECHECK isolated
  * probes' ([[BoundedHeapProbe]]): untimed warm pass, then min over reps
  * with a GC before each — so the recorded BENCH sf1 value and the
  * `SPARK_GRAFT_SCALE_ONLY` isolated number certify the same plane.
  * Prints `SF1Q <name> <bestSec> <spread> <anchorSec>`; the anchor is a
  * min-of-3 sample of the same trivial probe every harness uses, giving
  * the parent a cross-child machine-health spread for the sf1 window. */
object BenchSf1QueryChild {

  /** Per-rep stage metrics collector. Measures the locus question r19
    * left open (verdict #3): when a headliner reads 3× its comparable,
    * WHICH stage absorbed it — shuffle fetch wait, GC, or raw executor
    * time. Events arrive async on the listener bus, so the timed loop
    * tags the current rep via a volatile and sleeps briefly (untimed)
    * after each rep before re-tagging. */
  private final class StageCollector
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var rep: Int = -1
    // (rep, stageName, wallSec, runSec, gcSec, fetchWaitSec, shuffleReadMb)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Double, Double, Double, Double, Double)]()
    override def onStageCompleted(
        ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val r = rep
      val si = ev.stageInfo
      val tm = si.taskMetrics
      if (r >= 0 && tm != null) {
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield (c - s) / 1e3).getOrElse(-1.0)
        // the call-site suffix is the readable half of a stage name
        // (AQE's future-wrapped stages lead with an $anonfun blob)
        val loc = si.name.takeWhile(_ != '\n').split(" at ").last.take(40)
        rows.add((r, s"s${si.stageId}:$loc", wall,
          tm.executorRunTime / 1e3, tm.jvmGCTime / 1e3,
          tm.shuffleReadMetrics.fetchWaitTime / 1e3,
          tm.shuffleReadMetrics.totalBytesRead / 1048576.0))
      }
    }
  }

  private def r3(v: Double): Double = math.round(v * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val reps = args(2).toInt
    val cpus = Bench.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    def anchorProbe(): Unit = {
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      l.filter(l("l_quantity") > 0).groupBy("l_returnflag").count().collect()
      ()
    }
    // untimed warmup first (JVM/codegen/parquet-footer costs), THEN the
    // timed anchor sample — the near-fresh first probe is systematically
    // fast (r14's phantom-spread lesson) and must not be the sample
    anchorProbe()
    System.gc()
    val anchorSec = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      anchorProbe()
      (System.nanoTime() - t0) / 1e9
    }.min
    def once(): Unit =
      try fn(spark, dir).write.mode("overwrite").format("noop").save()
      finally graft.operators.QueryCaches.release()
    once() // warm: first-use plan/codegen/shuffle-file costs stay untimed
    val collector = new StageCollector
    spark.sparkContext.addSparkListener(collector)
    val times = (0 until reps).map { i =>
      System.gc()
      collector.rep = i
      val t0 = System.nanoTime()
      once()
      val t = (System.nanoTime() - t0) / 1e9
      // untimed: let the rep's async stage-completed events land under
      // its tag before the next rep claims the volatile
      Thread.sleep(250)
      t
    }
    collector.rep = -1
    val spread =
      if (times.size < 2) 1.0 else times.max / math.max(times.min, 1e-9)
    // the per-stage locus line: top stages by executor run time for the
    // FASTEST and SLOWEST reps — their diff names the stage that absorbed
    // a noisy window (shuffle fetch wait vs GC vs raw run time). Emitted
    // before SF1Q so a parse failure there can't lose the timing line.
    def topStages(rep: Int): String = {
      import scala.jdk.CollectionConverters._
      collector.rows.asScala.filter(_._1 == rep).toSeq
        .sortBy(-_._4).take(4)
        .map { case (_, nm, wall, run, gc, fetch, mb) =>
          val safe = nm.replaceAll("[\"\\\\]", "'")
          s"""{"stage":"$safe","wall_sec":${r3(wall)},"run_sec":${r3(run)},""" +
            s""""gc_sec":${r3(gc)},"fetch_wait_sec":${r3(fetch)},""" +
            s""""shuffle_read_mb":${r3(mb)}}"""
        }.mkString("[", ",", "]")
    }
    val fastI = times.indexOf(times.min)
    val slowI = times.indexOf(times.max)
    println(s"SF1STAGES $name " +
      s"""{"fast_rep_sec":${r3(times.min)},"slow_rep_sec":${r3(times.max)},""" +
      s""""fast":${topStages(fastI)},"slow":${topStages(slowI)}}""")
    println(s"SF1Q $name ${times.min} $spread $anchorSec")
    spark.stop()
  }
}
