package graft

/** Shared runner for the *Check mains that need their own JVM (the test
  * JVM already holds the shared `local[*]` context, and one JVM cannot
  * host two SparkContexts). Used by ClusterSuite / ConnectSuite /
  * StandaloneClusterSuite — one place for the spawn/capture/timeout
  * mechanics instead of a per-suite copy.
  *
  * Output is pumped on a DAEMON THREAD so the wall-clock timeout is
  * real: reading the child's stdout to EOF on the calling thread would
  * block forever on a wedged child and `waitFor(timeout)` would never
  * start — the suite (and CI) would hang instead of failing with the
  * captured tail. */
object SubprocessCheck extends org.scalatest.Assertions {

  /** Launch `mainClass` in a child JVM with the project classpath and
    * [[JvmOpens]]; returns (exitCode — None on timeout, full output).
    * On timeout the child is destroyed forcibly. */
  def run(mainClass: String, timeoutSec: Long,
      env: Map[String, String] = Map.empty,
      maxHeap: String = "2g"): (Option[Int], String) = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ JvmOpens.asArgv ++ Seq(
      s"-Xmx$maxHeap",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      mainClass)
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val pump = new Thread(() => {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = reader.readLine()
      while (line != null) {
        out.synchronized { out.append(line).append('\n') }
        line = reader.readLine()
      }
    }, s"subprocess-pump-$mainClass")
    pump.setDaemon(true)
    pump.start()
    val finished = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    pump.join(5000)
    (if (finished) Some(proc.exitValue()) else None,
      out.synchronized { out.toString })
  }

  /** Assert helper: run and require exit 0 plus a success marker line. */
  def assertOk(mainClass: String, marker: String, timeoutSec: Long,
      env: Map[String, String] = Map.empty): String = {
    val (exit, output) = run(mainClass, timeoutSec, env)
    val tail = output.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(exit.isDefined, s"$mainClass timed out after ${timeoutSec}s; tail:\n$tail")
    assert(exit.contains(0), s"$mainClass exited ${exit.get}; tail:\n$tail")
    assert(output.contains(marker), s"$mainClass marker '$marker' missing; tail:\n$tail")
    output
  }
}
