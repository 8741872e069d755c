package graft

import org.scalatest.funsuite.AnyFunSuite

/** Remote-client protocol pin: spawns [[ConnectCheck]] as a subprocess
  * (this test JVM already holds the shared `local[*]` context) and
  * asserts a THIN gRPC client — the Connect JDBC driver in a child-first
  * classloader, no engine classes of its own — can aggregate, project
  * and time-travel a server-side Delta table. The Spark-native replay of
  * the reference's `df://` remote flow (`remote_with_state`,
  * `examples/local_read_client.rs:31`), which was the one reference
  * lifecycle previously noted out of scope. */
class ConnectSuite extends AnyFunSuite {

  test("thin JDBC-over-gRPC client queries the server's delta table remotely") {
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
      "graft.ConnectCheck")
    val pb = new ProcessBuilder(cmd: _*)
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
    assert(finished, s"ConnectCheck timed out; tail:\n$tail")
    assert(proc.exitValue() == 0, s"ConnectCheck exited ${proc.exitValue()}; tail:\n$tail")
    assert(out.toString.contains("CONNECTCHECK OK"), s"marker missing; tail:\n$tail")
  }
}
