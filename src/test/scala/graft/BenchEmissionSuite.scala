package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's final stdout line is the driver's only full-fidelity perf
  * artifact: the driver keeps a 2000-char TAIL of stdout, sbt decoration
  * eats ~70 of it, and r15 proved the failure mode — the candidate ladder
  * bottomed out at `"queries":{}` and the round lost per-query visibility
  * entirely. This spec pins the contract against the REAL query registry:
  * whatever rung the ladder lands on must fit [[Bench.TailBudget]] and
  * still carry one entry per registered query plus the sf1 summary. */
class BenchEmissionSuite extends AnyFunSuite {

  private def pass(spike: Boolean): Bench.Pass = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      // realistic shape: mostly sub-second, a heavy tail, one outlier
      val v =
        if (spike && i % 13 == 0) 33.3
        else 0.9 + (i % 7) * 1.3
      (n, v, 1.2)
    }
    Bench.Pass(results, 3, "/root/testdata/sf0.1", 0.151, 0.192, 1.272)
  }

  private def sf1Extra(top: Int): String = {
    if (top < 0) return """"sf1":{"anchor_polluted":true,"total":48.094},"""
    val qs =
      if (top <= 0) ""
      else Seq("dd02" -> 4.22, "dd12" -> 10.26, "pp01" -> 7.79,
        "dd03" -> 5.65, "ss07" -> 4.91, "dd10" -> 4.29).take(top)
        .map { case (k, v) => "\"" + k + "\":" + Bench.ms(v) }
        .mkString(""","queries":{""", ",", "}")
    s""""sf1":{"anchor_polluted":true,"total":48.094,"anchor_spread":1.410,"reps":2$qs},"""
  }

  // the production composition, WORST CASE for the budget: the compact
  // pollution marker (r19 — the final line carries only the load-bearing
  // "anchor_polluted"; retry counts stay on the full-precision line 1)
  // + plane fields ride EVERY candidate rung
  private def extraWithPlane(top: Int): String =
    """"anchor_polluted":true,""" +
      Bench.planeExtra(Bench.defaultCpus) + sf1Extra(top)

  test("final line fits the tail budget and keeps EVERY per-query value") {
    Seq(true, false).foreach { spike =>
      val line = Bench.finalLine(pass(spike), extraWithPlane)
      assert(line.length <= Bench.TailBudget,
        s"final line is ${line.length} chars (budget ${Bench.TailBudget})")
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      val nQueries = math.max(n.path("queries").size(), n.path("queries_ds").size())
      assert(nQueries === SparkEntry.queries.size,
        "a rung that drops per-query values must never win while a " +
          "denser encoding exists")
      if (n.has("queries_ds")) assert(n.path("q_unit").asText() === "ds")
      assert(n.path("sf1").path("total").asDouble() > 0, "sf1 summary embedded")
      assert(n.path("anchor_spread").asDouble() > 0)
      assert(n.path("value").asDouble() > 0)
      // plane fields (r16 verdict #1): every number names its plane
      assert(n.path("master").asText().startsWith("local["))
      assert(n.path("shuffle_partitions").asInt() > 0)
    }
  }

  test("a skipped sf1 anchor is an explicit marker, never a missing key") {
    val skipExtra = Bench.planeExtra("32") + """"sf1":{"skipped":"disabled"},"""
    val line = Bench.finalLine(pass(spike = false), _ => skipExtra)
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(n.path("sf1").path("skipped").asText() === "disabled")
  }

  test("ds keys strip index zero-padding unambiguously") {
    // calls the PRODUCTION shortening (not a re-implementation that could
    // drift): uniqueness here is what keeps the ds map loss-free
    val names = SparkEntry.queries.keys.toSeq
    val shorts = names.map(Bench.shortKey)
    assert(shorts.distinct.size === names.size,
      "zero-stripped bench keys must stay unique per query")
  }
}
