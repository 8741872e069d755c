package graft

/** The JDK-17 `--add-opens` set Spark 4 needs to reflect into JDK
  * internals — the SINGLE source of truth for every child JVM this
  * project spawns: `local-cluster` executors ([[ClusterCheck]]),
  * standalone deploy daemons and their executors
  * ([[StandaloneClusterCheck]]), and the test suites' subprocess
  * runners. A JDK bump that needs a new package edits this list once. */
object JvmOpens {
  val Packages: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  /** Single-token `--add-opens=p=ALL-UNNAMED` form — for option STRINGS
    * like `spark.executor.extraJavaOptions`. */
  def asOptionString: String =
    Packages.map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** Two-token `--add-opens p=ALL-UNNAMED` argv form — for
    * ProcessBuilder command lists. */
  def asArgv: Seq[String] =
    Packages.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
}
