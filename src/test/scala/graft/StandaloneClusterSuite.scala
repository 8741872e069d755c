package graft

import org.scalatest.funsuite.AnyFunSuite

/** Separate-PROCESS deployment pin: spawns [[StandaloneClusterCheck]] as a
  * subprocess (the shared test JVM holds a `local[*]` context), which in
  * turn boots a standalone Master process and Worker process and replays
  * the whole [[ClusterCheck]] surface through `spark://` — the reference's
  * scheduler-binary + executor-binary lifecycle
  * (`examples/custom_scheduler.rs`, `examples/custom_executor.rs`)
  * re-expressed as Spark standalone deploy mode. */
class StandaloneClusterSuite extends AnyFunSuite {

  test("provider surface runs under a separate-process standalone master/worker") {
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
      "graft.StandaloneClusterCheck")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    val finished = proc.waitFor(420, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    val tail = out.toString.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(finished, s"StandaloneClusterCheck timed out; tail:\n$tail")
    assert(proc.exitValue() == 0,
      s"StandaloneClusterCheck exited ${proc.exitValue()}; tail:\n$tail")
    assert(out.toString.contains("STANDALONECHECK OK"), s"marker missing; tail:\n$tail")
  }
}
