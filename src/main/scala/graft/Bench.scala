package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** One measured pass over `names` at `sfDir`: min-over-interleaved-reps
    * per query plus the calibration-anchor stats for the pass window. */
  private case class Pass(
      results: Seq[(String, Double, Double)], // (name, bestSec, spread)
      reps: Int, sfDir: String,
      aMin: Double, aMax: Double, aSpread: Double)

  private def runPass(
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
    Pass(results, reps, sfDir, aMin, aMax, aSpread)
  }

  private def ms(v: Double): String =
    if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** JSON line for one pass; `scale` sets the queries-map precision
    * (negative = omit the per-query map, header stats kept); `extra` is
    * an optional pre-rendered `"key":value,` fragment spliced before the
    * trailing "sf" field. */
  private def lineOf(p: Pass, scale: Int, extra: String = ""): String = {
    val ok = p.results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val failed = p.results.count(_._2 < 0)
    val spreads = ok.map(_._3)
    val spreadMax = if (spreads.isEmpty) 1.0 else spreads.max
    val spreadQ = ok.sortBy(-_._3).headOption
      .map(_._1.takeWhile(_ != '_')).getOrElse("")
    val spreadMed = if (spreads.isEmpty) 1.0 else spreads.sorted.apply(spreads.size / 2)
    val qs = if (scale < 0) "{}" else p.results.map { case (k, v, _) =>
      val s = if (v < 0) "-1" else {
        // trim trailing zeros ("3.40"→"3.4", "2.00"→"2") — with 150+ queries
        // every byte of the final line counts against the capture window
        val r = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
        if (r.contains('.')) r.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else r
      }
      "\"" + k.takeWhile(_ != '_') + "\":" + s
    }.mkString("{", ",", "}")
    s"""{"metric":"total","value":${ms(total)},"unit":"sec","failed":$failed,"reps":${p.reps},"spread_max":${ms(spreadMax)},"spread_max_q":"$spreadQ","spread_med":${ms(spreadMed)},"anchor_min":${ms(p.aMin)},"anchor_max":${ms(p.aMax)},"anchor_spread":${ms(p.aSpread)},"queries":$qs,$extra"sf":"${p.sfDir}"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val main = runPass(spark, sfDir, names, reps)

    // ---- second anchor at ~sf1 (10× data): shuffles dominate there, so a
    // regression that hides inside constant factors at sf0.1 shows up in
    // this line. The scaled dir is ScaleCheck's derived fixture set
    // (idempotent; generated here when absent). Headline subset × 2 reps
    // keeps the pass a few minutes. Skipped for targeted local runs
    // (SPARK_GRAFT_ONLY) or with SPARK_GRAFT_SF1=0.
    val sf1Pass: Option[Pass] =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_SF1").contains("0")) None
      else try {
        val workDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-scalecheck/sf1")
        ScaleCheck.generate(spark, sfDir, workDir, copies = 10)
        val headline = Seq("q01", "q12", "dd02", "dd03", "dd09", "dd10", "dd12",
          "ss01", "ss07", "ss10", "pp01", "tx09", "dl09", "mm06")
        val subset = headline.flatMap(p => names.find(_._1.startsWith(p)))
        Some(runPass(spark, workDir, subset, reps = 2, dropFirstAnchor = false))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 pass skipped: ${e.getMessage}"); None
      }

    // The driver records a 2000-char TAIL of stdout, so the LAST line must
    // be a complete JSON object under that window — r13 proved it: one
    // 2.3 KB line lost its head (metric/total/anchor fields) and the driver
    // recorded "parsed": null, blinding the round's perf gate and hiding
    // the anchor stats that would have flagged the polluted run.
    // Emission contract: lines 1-2 = full-precision sf0.1 + sf1 JSON
    // (humans, logs, local diffing — clipped from the driver tail, fine);
    // FINAL line = the sf0.1 compact line with the sf1 anchor EMBEDDED as
    // an "sf1" sub-object — measured r15: 155 compact queries alone run
    // ~1.9 KB, so two separate complete lines cannot share the window.
    // Degradation order: shrink main precision → drop sf1 queries (keep
    // its total/anchor_spread) → drop the main map.
    println(lineOf(main, 3))
    sf1Pass.foreach(p => println(lineOf(p, 2)))
    def sf1Extra(withQueries: Boolean): String = sf1Pass.map { p =>
      val ok = p.results.filter(_._2 >= 0)
      val qs =
        if (!withQueries) ""
        else ok.sortBy(-_._2).take(8).map { case (k, v, _) =>
          "\"" + k.takeWhile(_ != '_') + "\":" + ms(v) }
          .mkString(""","queries":{""", ",", "}")
      s""""sf1":{"total":${ms(ok.map(_._2).sum)},"anchor_spread":${ms(p.aSpread)},"reps":${p.reps}$qs},"""
    }.getOrElse("")
    val candidates =
      Seq(3, 2, 1).map(s => lineOf(main, s, sf1Extra(withQueries = true))) ++
        Seq(1, -1).map(s => lineOf(main, s, sf1Extra(withQueries = false)))
    val compact = candidates.find(_.length <= 1950)
      .getOrElse(lineOf(main, -1))
    println(compact)
    spark.stop()
  }
}
