package graft

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Dev tool: write each query's `.explain("formatted")` output — the
  * AQE-FINAL physical plan, captured after execution — to
  * `<outDir>/<query>.txt`, on the SAME plane as the bench (local[cpus],
  * shuffle.partitions = cpus), so the committed plan artifacts under
  * plans/r21/ show the plans the bench actually ran.
  *
  * Usage: sbt 'runMain graft.PlanDump <sfDir> <outDir> <namePrefix,...> [suffix]'
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val prefixes = args(2).split(',').toSeq
    val suffix = if (args.length > 3) args(3) else ""
    val cpus = Bench.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.functions.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val out = new PrintWriter(s"$outDir/$name$suffix.txt")
        try {
          val df = fn(spark, sfDir)
          // execute THIS QueryExecution so its AdaptiveSparkPlan finalizes
          // (a noop write would execute a sibling QueryExecution and leave
          // this one's plan at isFinalPlan=false, hiding AQE reuse/joins)
          df.collect()
          out.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable => out.println(s"ERROR: ${e.getMessage}") }
        finally {
          out.close()
          graft.operators.QueryCaches.release()
        }
      }
    spark.stop()
  }
}
