package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan shapes the operator scaladocs promise — a
  * correctness-of-intent gate: a future edit that silently turns a
  * broadcast into a shuffle, drops a pushed filter, or loses the top-k
  * operator fails here, not in a 100 TB production run. */
class PlanShapeSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection are pushed into the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("p_size"),
      s"expected pushed filters in:\n$p")
    // pruned scan: p_name is not read
    assert(!p.contains("p_name"), "projection pruning lost p_name elimination")
  }

  test("q03: dimension chain is broadcast, not shuffled") {
    val p = planOf("q03_join_multi")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dims should never sort-merge")
  }

  test("q18: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q18_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("q10: tiny theta-join side is broadcast nested loop") {
    val p = planOf("q10_theta_join")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ in:\n$p")
  }

  test("ss01: query side broadcasts with its filter pushed to the scan") {
    val p = planOf("ss01_topk_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("vec_id"), s"expected vec_id pushdown in:\n$p")
  }

  test("ev01: single partial+final aggregate over a column-pruned scan") {
    val p = planOf("ev01_tumbling")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("props"), "events scan should prune unused columns")
  }
}
