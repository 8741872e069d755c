package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Dev tool (guide §7.3: driver thread dumps, automated): several queries
  * in this suite spend most of their wall time with NO job running —
  * QueryProfile shows e.g. dl27 at 3.8s wall / 0.5 task-seconds. This
  * samples the driver MAIN thread's stack every few ms while a query runs
  * and prints (a) the top collapsed two-frame signatures and (b) the top
  * "owner" buckets (planning / codegen / FS / log replay / commit / other)
  * so the driver time has a name before anything is changed.
  *
  * Usage: sbt 'runMain graft.DriverHotspots <sfDir> <queryName> [reps]'
  */
object DriverHotspots {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = Bench.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    // untimed warmup (codegen caches, parquet footers) — sampling the cold
    // run would blame one-time JIT/codegen the bench's min never sees
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    graft.operators.QueryCaches.release()

    val main = Thread.currentThread()
    val pairCounts = new ConcurrentHashMap[String, java.lang.Long]()
    val bucketCounts = new ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = true
    @volatile var samples = 0L
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        if (st.nonEmpty) {
          samples += 1
          val interesting = st.filter { f =>
            val c = f.getClassName
            c.startsWith("org.apache.spark") || c.startsWith("graft") ||
              c.startsWith("org.apache.hadoop") || c.startsWith("org.apache.parquet") ||
              c.startsWith("com.fasterxml") || c.startsWith("org.codehaus")
          }
          val sig = interesting.take(2).map(f =>
            s"${f.getClassName.split('.').last}.${f.getMethodName}").mkString(" <- ")
          pairCounts.merge(if (sig.isEmpty) "(non-spark)" else sig, 1L, (a, b) => a + b)
          val all = st.map(_.getClassName).mkString("\n")
          // attribute shell forks / raw-FS permission loads to the nearest
          // graft or hadoop-fs CALLER so the fork site has a name
          if (all.contains("hadoop.util.Shell") || all.contains("loadPermissionInfo")) {
            val caller = st.find { f =>
              val c = f.getClassName
              c.startsWith("graft") || c.startsWith("org.apache.spark")
            }.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
              .getOrElse("(unattributed)")
            pairCounts.merge(s"SHELL-FORK via $caller", 1L, (a, b) => a + b)
          }
          // name what AQE's plan-update lambda is doing (stringify vs else)
          if (st.exists(_.getMethodName.contains("withFinalPlanUpdate"))) {
            val top = st.take(5).map(f =>
              s"${f.getClassName.split('.').last}.${f.getMethodName}").mkString(" <- ")
            pairCounts.merge(s"AQE-UPDATE: $top", 1L, (a, b) => a + b)
          }
          val bucket =
            if (all.contains("janino") || all.contains("CodeGenerator")) "codegen-compile"
            else if (all.contains("catalyst.optimizer") || all.contains("RuleExecutor")) "analysis/optimizer"
            else if (all.contains("QueryPlanner") || all.contains("SparkStrategies")) "physical-planning"
            else if (all.contains("DeltaLog") || all.contains("DeltaStateReconstruction")) "delta-log-replay"
            else if (all.contains("RawLocalFileSystem") || all.contains("hadoop.fs")) "hadoop-fs"
            else if (all.contains("DAGScheduler") || all.contains("runJob") || all.contains("awaitResult") || all.contains("ThreadUtils")) "await-job"
            else if (all.contains("catalyst.analysis")) "analysis/optimizer"
            else if (all.contains("org.apache.spark.sql")) "spark-sql-other"
            else "other"
          bucketCounts.merge(bucket, 1L, (a, b) => a + b)
        }
        Thread.sleep(3)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (0 until reps).foreach { _ =>
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      graft.operators.QueryCaches.release()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(50)

    println(f"== $name: $reps reps, ${wall}%.2f s wall, $samples samples ==")
    println("-- buckets --")
    import scala.jdk.CollectionConverters._
    bucketCounts.asScala.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"$v%6d  ${100.0 * v / samples}%5.1f%%  $k")
    }
    println("-- top frames (driver main) --")
    pairCounts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"$v%6d  ${100.0 * v / samples}%5.1f%%  $k")
    }
    spark.stop()
  }
}
