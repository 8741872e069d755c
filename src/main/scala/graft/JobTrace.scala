package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool (guide §1: measure first): per-JOB trace for a single query —
  * QueryProfile counts jobs, this names them. For lifecycle queries (the
  * dl family) whose wall time is mostly tiny-job scheduling, knowing WHICH
  * statement schedules each job (callsite + description + duration) is the
  * prerequisite for cutting the count.
  *
  * Usage: sbt 'runMain graft.JobTrace <sfDir> <queryName>'
  */
object JobTrace {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
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

    // warm rep: codegen/footer caches — trace the steady-state rep only
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    graft.operators.QueryCaches.release()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = {
        val desc = Option(ev.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val stages = ev.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct.mkString(" ; ")
        starts.put(ev.jobId, (System.nanoTime(), s"$stages | $desc"))
      }
      override def onJobEnd(ev: SparkListenerJobEnd): Unit = {
        Option(starts.remove(ev.jobId)).foreach { case (t0, what) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add(f"job ${ev.jobId}%3d  $ms%7.1f ms  $what")
        }
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    graft.operators.QueryCaches.release()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(200)
    println(f"== $name: ${wall}%.2f s wall, ${lines.size} jobs ==")
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq.sortBy(l => l.drop(4).trim.takeWhile(_.isDigit).toInt)
      .foreach(println)
    spark.stop()
  }
}
