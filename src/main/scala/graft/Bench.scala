package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    // untimed warmup: JVM/codegen/parquet-footer costs otherwise land on
    // whichever query happens to run first (measured ~5s of noise)
    def anchorProbe(): Unit = {
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      l.filter(l("l_quantity") > 0).groupBy("l_returnflag").count().collect()
      ()
    }
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
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // fixed name order within a pass: run-to-run comparable timings, and
    // queries sharing cached sub-plans (dd03/dd06/pp01's minhash pipeline)
    // warm predictably
    val names = selected.toSeq.sortBy(_._1)
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
        // up evicted-but-pinned blocks across reps × 139 queries, adding
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
    // The driver records a 2000-char TAIL of stdout, so the LAST line must
    // be a complete JSON object under that window — r13 proved it: one
    // 2.3 KB line lost its head (metric/total/anchor fields) and the driver
    // recorded "parsed": null, blinding the round's perf gate and hiding
    // the anchor stats that would have flagged the polluted run.
    // Emission contract now: line 1 = full-precision JSON (humans, logs,
    // local diffing); final line = header + a precision-adaptive compact
    // queries map, shrunk until the whole line fits comfortably inside the
    // capture window. Short keys (the unique "q01"/"fn13" prefix) on both.
    def ms(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    val spreads = results.filter(_._2 >= 0).map(_._3)
    val spreadMax = if (spreads.isEmpty) 1.0 else spreads.max
    val spreadQ = results.filter(_._2 >= 0).sortBy(-_._3).headOption
      .map(_._1.takeWhile(_ != '_')).getOrElse("")
    val spreadMed = if (spreads.isEmpty) 1.0 else spreads.sorted.apply(spreads.size / 2)
    // spread compares LIKE samples: the first anchor runs in a near-fresh
    // JVM (small heap, cold codegen caches, no pinned broadcast blocks)
    // and is SYSTEMATICALLY the fastest — r14 measured 0.12s first vs
    // 0.26-0.34s for every steady-state sample on an idle machine, a
    // phantom 2.9x "spread" that would discount a perfectly clean run.
    // So the interference signal uses steady-state samples only (drop the
    // pre-pass one); machine interference inflates SOME steady sample
    // relative to the others, which is exactly what max/min then catches.
    val steady = if (anchorTimes.size >= 2) anchorTimes.drop(1).toSeq else anchorTimes.toSeq
    val (aMin, aMax) = if (steady.isEmpty) (-1.0, -1.0) else (steady.min, steady.max)
    val aSpread = if (aMin <= 0) -1.0 else aMax / math.max(aMin, 1e-9)
    def line(qs: String): String =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","failed":$failed,"reps":$reps,"spread_max":${ms(spreadMax)},"spread_max_q":"$spreadQ","spread_med":${ms(spreadMed)},"anchor_min":${ms(aMin)},"anchor_max":${ms(aMax)},"anchor_spread":${ms(aSpread)},"queries":$qs,"sf":"$sfDir"}"""
    def qmap(scale: Int): String = results.map { case (k, v, _) =>
      val s = if (v < 0) "-1" else {
        // trim trailing zeros ("3.40"→"3.4", "2.00"→"2") — with 150+ queries
        // every byte of the final line counts against the capture window
        val r = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
        if (r.contains('.')) r.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else r
      }
      "\"" + k.takeWhile(_ != '_') + "\":" + s
    }.mkString("{", ",", "}")
    println(line(qmap(3)))
    // final line: first precision whose full line fits the 2000-char tail
    // with margin; worst case (all timings 5 digits at 1 decimal) drops the
    // map entirely rather than emit an unparseable truncated line
    val compact = Seq(3, 2, 1).map(s => line(qmap(s))).find(_.length <= 1900)
      .getOrElse(line("{}"))
    println(compact)
    spark.stop()
  }
}
