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
    SubprocessCheck.assertOk("graft.ConnectCheck", "CONNECTCHECK OK", 300)
  }
}
