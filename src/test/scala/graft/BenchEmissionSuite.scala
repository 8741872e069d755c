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

  /** realistic = the MEASURED r19 value distribution (124 of 161 queries
    * under 1.0s → 1-digit deciseconds); pathological = every 13th query a
    * 33s outlier, every value multi-digit — the shape that must degrade
    * GRACEFULLY (sf1 map first, main map never). */
  private def pass(pathological: Boolean): Bench.Pass = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      val v =
        if (pathological) { if (i % 13 == 0) 33.3 else 0.9 + (i % 7) * 1.3 }
        else if (i % 4 == 0) 1.0 + (i % 25) * 0.12
        else 0.15 + (i % 8) * 0.09
      (n, v, 1.2)
    }
    Bench.Pass(results, 3, "/root/testdata/sf0.1", 0.151, 0.192, 1.272)
  }

  // the PRODUCTION sf1 renderer (not a re-implementation that could
  // drift), fed every headliner (keyed exactly as line 2 keys them —
  // family prefix), both pollution markers live, and a q_polluted stamp
  private def sf1Summary(pathological: Boolean): Bench.Sf1Summary = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val qs = Bench.Sf1Headline.zipWithIndex.map { case (prefix, i) =>
      val full = names.find(_.startsWith(prefix)).getOrElse(
        fail(s"no registered query with headline prefix $prefix"))
      full.takeWhile(_ != '_') ->
        (if (pathological || i == 0) 20.342 else 2.0 + i * 0.7)
    }
    Bench.Sf1Summary(total = 159.094, aSpread = 1.483, reps = 2,
      polluted = true, qPolluted = Seq("dd12"), qs = qs)
  }

  // the production composition, worst case for the budget: the compact
  // pollution marker + the adaptive-rep counter (r20 — both load-bearing
  // on the final line) + plane fields ride EVERY candidate rung
  private def extraWithPlane(pathological: Boolean)(mode: Int): String =
    """"extra_reps":9,"anchor_polluted":true,""" +
      Bench.planeExtra(Bench.defaultCpus) +
      Bench.sf1ExtraFor(Some(sf1Summary(pathological)), "unused")(mode)

  test("final line fits the tail budget and keeps EVERY per-query value") {
    Seq(true, false).foreach { pathological =>
      val line = Bench.finalLine(pass(pathological), extraWithPlane(pathological))
      assert(line.length <= Bench.TailBudget,
        s"final line is ${line.length} chars (budget ${Bench.TailBudget})")
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      val nQueries = math.max(n.path("queries").size(), n.path("queries_ds").size())
      assert(nQueries === SparkEntry.queries.size,
        "a rung that drops per-query values must never win while a " +
          "denser encoding exists")
      if (n.has("queries_ds")) assert(n.path("q_unit").asText() === "ds")
      assert(n.path("sf1").path("total").asDouble() > 0, "sf1 summary embedded")
      // r19 verdict #1: a per-query pollution stamp is load-bearing and
      // must survive EVERY winning rung, realistic or pathological
      assert(n.path("sf1").path("q_polluted").elements().next().asText()
        === "dd12")
      assert(n.path("anchor_spread").asDouble() > 0)
      assert(n.path("value").asDouble() > 0)
      // plane fields (r16 verdict #1): every number names its plane
      assert(n.path("master").asText().startsWith("local["))
      assert(n.path("shuffle_partitions").asInt() > 0)
    }
  }

  test("all 14 sf1 headliners survive to the final line at the measured shape") {
    // r19 verdict #2: the old top-6 seconds map left 8 of 14 headliner
    // values unrecorded. At the distribution the real record measures
    // (r19: 124 of 161 queries 1-digit ds), the sf1_ds rung must fit —
    // the per-query 1.5x done-bar is undecidable for a dropped value.
    val line = Bench.finalLine(pass(pathological = false),
      extraWithPlane(pathological = false))
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    val sf1Count = math.max(
      n.path("sf1").path("queries").size(), n.path("sf1_ds").size())
    assert(sf1Count === Bench.Sf1Headline.size,
      s"got $sf1Count of ${Bench.Sf1Headline.size} sf1 headliners in: " +
        line.takeRight(400))
    // degradation order under the pathological shape: sf1 values may
    // compress away, but the main map and the pollution stamps never
    val worst = Bench.finalLine(pass(pathological = true),
      extraWithPlane(pathological = true))
    val w = new com.fasterxml.jackson.databind.ObjectMapper().readTree(worst)
    assert(math.max(w.path("queries").size(), w.path("queries_ds").size())
      === SparkEntry.queries.size)
    assert(w.path("sf1").path("q_polluted").size() === 1)
  }

  test("driver-contract line: float-second queries map for EVERY query, within budget") {
    // r21 verdict #2: the driver parses the LAST line's `"queries"` as
    // {name: float seconds}; the ds-only rung left PERF blind since ~r14.
    Seq(true, false).foreach { pathological =>
      val extra: Int => String = {
        case -2 => """"anchor_polluted":true,""" + Bench.planeExtra(Bench.defaultCpus)
        case m => """"anchor_polluted":true,""" + Bench.planeExtra(Bench.defaultCpus) +
          Bench.sf1ExtraFor(Some(sf1Summary(pathological)), "unused")(m)
      }
      val line = Bench.contractLine(pass(pathological), extra)
      assert(line.length <= Bench.TailBudget,
        s"contract line is ${line.length} chars (budget ${Bench.TailBudget})")
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      assert(n.path("metric").asText() === "total")
      assert(n.path("unit").asText() === "sec")
      assert(n.path("value").asDouble() > 0)
      assert(n.path("sf").asText().nonEmpty)
      // SECONDS, never deciseconds, and never a dropped query
      assert(!n.has("queries_ds"))
      assert(n.path("queries").size() === SparkEntry.queries.size)
      // plane fields ride the contract line too
      assert(n.path("master").asText().startsWith("local["))
      assert(n.path("shuffle_partitions").asInt() > 0)
      // sanity: a representative value round-trips as a float second
      val it = n.path("queries").properties().iterator()
      var any = false
      while (it.hasNext) { val e = it.next(); if (e.getValue.asDouble() > 0) any = true }
      assert(any, "at least one positive float-second value")
    }
  }

  test("the skip marker scrubs control chars and quotes from the reason") {
    val frag = Bench.sf1ExtraFor(None, "boom\t\"quoted\"\nline")(2)
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{" + frag.stripSuffix(",") + "}")
    assert(n.path("sf1").path("skipped").asText() === "boom 'quoted' line")
  }

  test("a skipped sf1 anchor is an explicit marker, never a missing key") {
    val skipExtra = Bench.planeExtra("32") + """"sf1":{"skipped":"disabled"},"""
    val line = Bench.finalLine(pass(pathological = false), _ => skipExtra)
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
