package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (guide §1: measure first): per-query cost DECOMPOSITION the
  * bench's single wall number can't provide — how many Spark jobs and
  * stages a query schedules, how many bytes its shuffles move, and how
  * much executor/GC/fetch time its tasks burn. At sf0.1 most queries are
  * fixed-overhead dominated (10× data moves many of them < 2×), so the
  * job/stage/exchange COUNT is the optimization target, and this is the
  * tool that ranks it.
  *
  * Usage: sbt 'runMain graft.QueryProfile <sfDir> [namePrefix,...] [reps]'
  * Prints one line per query: wall (min over reps), jobs, stages, task
  * time, shuffle read/write MB — all from the LAST rep (job/stage counts
  * are plan properties, identical across reps; the wall min is noise
  * policy, same as Bench).
  */
object QueryProfile {

  private final class Counter extends SparkListener {
    @volatile var active = false
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val fetchMs = new java.util.concurrent.atomic.AtomicLong
    val shufReadB = new java.util.concurrent.atomic.AtomicLong
    val shufWriteB = new java.util.concurrent.atomic.AtomicLong
    def reset(): Unit = Seq(jobs, stages, taskMs, gcMs, fetchMs, shufReadB, shufWriteB)
      .foreach(_.set(0))
    override def onJobStart(ev: SparkListenerJobStart): Unit =
      if (active) jobs.incrementAndGet()
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
      if (active) {
        stages.incrementAndGet()
        val tm = ev.stageInfo.taskMetrics
        if (tm != null) {
          taskMs.addAndGet(tm.executorRunTime)
          gcMs.addAndGet(tm.jvmGCTime)
          fetchMs.addAndGet(tm.shuffleReadMetrics.fetchWaitTime)
          shufReadB.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
          shufWriteB.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val prefixes = if (args.length > 1) args(1).split(',').toSeq else Seq("")
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = Bench.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stg"}%5s ${"taskS"}%7s ${"gcS"}%6s ${"fetchS"}%7s ${"shRdMB"}%7s ${"shWrMB"}%7s")
    names.foreach { case (name, fn) =>
      try {
        // untimed warm rep (codegen/broadcast warmup, same policy as Bench)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        graft.operators.QueryCaches.release()
        var best = Double.MaxValue
        (0 until reps).foreach { _ =>
          System.gc()
          counter.reset()
          counter.active = true
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val t = (System.nanoTime() - t0) / 1e9
          // let async listener events land before reading the counters
          Thread.sleep(200)
          counter.active = false
          graft.operators.QueryCaches.release()
          if (t < best) best = t
        }
        println(f"$name%-28s $best%7.2f ${counter.jobs.get}%5d ${counter.stages.get}%5d " +
          f"${counter.taskMs.get / 1e3}%7.2f ${counter.gcMs.get / 1e3}%6.2f ${counter.fetchMs.get / 1e3}%7.2f " +
          f"${counter.shufReadB.get / 1048576.0}%7.1f ${counter.shufWriteB.get / 1048576.0}%7.1f")
      } catch { case e: Throwable =>
        counter.active = false
        graft.operators.QueryCaches.release()
        println(s"$name ERROR: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
