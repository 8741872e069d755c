package graft

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the AQE-finalized physical plan of every SparkEntry query
  * (or a prefix-filtered subset) so shuffle/broadcast/pushdown choices can
  * be audited against the scale notes in each operator module's scaladoc.
  *
  * Usage: sbt 'runMain graft.PlanAudit <sfDir> <outFile> [namePrefix,...]'
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val prefixes = if (args.length > 2) args(2).split(',').toSeq else Seq("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the full engine surface, same as Verify/Bench: native functions,
      // Delta SQL parser, generated-partition pruning — an audit without
      // the injected optimizer rules would show plans the engine never runs
      .config("spark.sql.extensions", classOf[graft.functions.GraftSparkExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new PrintWriter(outFile)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        out.println(s"===== $name =====")
        try {
          val df = fn(spark, sfDir)
          df.collect() // run so AQE finalizes the plan
          out.println(df.queryExecution.executedPlan.toString)
        } catch { case e: Throwable => out.println(s"ERROR: ${e.getMessage}") }
        // audited plans must be the plans a FRESH session runs: leftover
        // registered caches would make the CacheManager substitute
        // InMemoryRelations into later queries' matching subtrees (the
        // PlanShapeSuite lesson), masking broadcasts/pushdowns
        finally graft.operators.QueryCaches.release()
      }
    out.close()
    spark.stop()
  }
}
