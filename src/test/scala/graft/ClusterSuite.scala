package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multi-JVM execution pin: spawns [[ClusterCheck]] as a subprocess (this
  * test JVM already holds the shared `local[*]` context, and one JVM
  * cannot host two SparkContexts) and asserts the whole provider surface —
  * golden fixture, distributed DV delete, column-mapped read — survives
  * executors that live in SEPARATE JVMs. A closure that accidentally
  * captures a non-serializable (the classic FileFormat/Configuration
  * mistake) passes every local[*] test and dies only here. */
class ClusterSuite extends AnyFunSuite {

  test("provider surface runs under local-cluster[2,2,1024] (separate executor JVMs)") {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.ClusterCheck")
    val pb = new ProcessBuilder(cmd: _*)
    // the worker threads launch executor JVMs through the dist's launch
    // machinery — it needs SPARK_HOME, and SPARK_SCALA_VERSION because
    // load-spark-env.sh (which normally sets it) never runs for
    // in-process workers (the launcher otherwise probes source-checkout
    // build dirs and dies with "Cannot find any build directories")
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    val tail = out.toString.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(finished, s"ClusterCheck timed out; tail:\n$tail")
    assert(proc.exitValue() == 0, s"ClusterCheck exited ${proc.exitValue()}; tail:\n$tail")
    assert(out.toString.contains("CLUSTERCHECK OK"), s"marker missing; tail:\n$tail")
  }
}
