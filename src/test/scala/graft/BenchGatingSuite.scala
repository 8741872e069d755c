package graft

import org.scalatest.funsuite.AnyFunSuite

/** The anchor-gated bench record (r18 verdict #1): a polluted measurement
  * window must be retried and, failing that, self-mark — these pins cover
  * the pure merge/retry decisions so the expensive end-to-end path only
  * has to be read, not re-derived, when a record looks odd. */
class BenchGatingSuite extends AnyFunSuite {

  private def pass(vals: Seq[(String, Double, Double)], aSpread: Double) =
    Bench.Pass(vals, 3, "sf", 0.1, 0.1 * aSpread, aSpread)

  test("mergePasses keeps each query's min and the healthiest anchors") {
    val p1 = pass(Seq(("a", 2.0, 1.1), ("b", -1.0, 1.0), ("c", 5.0, 1.4)), 2.1)
    val p2 = pass(Seq(("a", 3.0, 1.3), ("b", 4.0, 1.2), ("c", 4.5, 1.2)), 1.2)
    val m = Bench.mergePasses(Seq(p1, p2))
    assert(m.results === Seq(("a", 2.0, 1.1), ("b", 4.0, 1.2), ("c", 4.5, 1.2)))
    // anchors from the healthiest pass (p2), not the first
    assert(m.aSpread === 1.2)
  }

  test("mergePasses: a query crashed in every pass stays -1") {
    val p1 = pass(Seq(("a", -1.0, 1.0)), 1.1)
    val p2 = pass(Seq(("a", -1.0, 1.0)), 1.3)
    assert(Bench.mergePasses(Seq(p1, p2)).results === Seq(("a", -1.0, 1.0)))
  }

  test("combineChild min-merges best and anchor; spread follows the winner") {
    import Bench.{combineChild, ChildRes}
    val merged = combineChild(
      ChildRes("q", 10.0, 2.0, 0.30), ChildRes("q", 6.0, 1.1, 0.15))
    assert(merged === ChildRes("q", 6.0, 1.1, 0.15))
    // a crashed retry must not erase a good first attempt
    assert(combineChild(
      ChildRes("q", 6.0, 1.1, 0.15), ChildRes("q", -1.0, 1.0, -1.0))
      === ChildRes("q", 6.0, 1.1, 0.15))
    // a crashed first attempt is recovered by the retry
    assert(combineChild(
      ChildRes("q", -1.0, 1.0, -1.0), ChildRes("q", 7.0, 1.2, 0.2))
      === ChildRes("q", 7.0, 1.2, 0.2))
  }

  test("childNeedsRetry: noisy window, missing anchor, or crash") {
    import Bench.{childNeedsRetry, ChildRes}
    val minA = 0.15
    assert(!childNeedsRetry(ChildRes("q", 5.0, 1.1, 0.16), minA))
    assert(childNeedsRetry(ChildRes("q", 5.0, 1.1, 0.30), minA), "anchor 2x min")
    assert(childNeedsRetry(ChildRes("q", -1.0, 1.0, 0.16), minA), "crashed")
    assert(childNeedsRetry(ChildRes("q", 5.0, 1.1, -1.0), minA), "no anchor")
  }

  test("queryExceedsComparable binds per QUERY against the committed value") {
    // r19 verdict #1: dd12 recorded 2.88x its committed isolated
    // comparable (20.34s vs 7.07s) under a PASSING window gate — the
    // per-query gate is what makes that recording impossible to miss
    import Bench.{queryExceedsComparable, ChildRes}
    val comparables = Map("dd12_lsh_quality" -> 7.073)
    assert(queryExceedsComparable(
      ChildRes("dd12_lsh_quality", 20.342, 1.0, 0.2), comparables),
      "r19's exact recorded defect must trip the gate")
    assert(!queryExceedsComparable(
      ChildRes("dd12_lsh_quality", 7.5, 1.0, 0.2), comparables),
      "within 1.5x of the comparable is a readable value")
    assert(!queryExceedsComparable(
      ChildRes("new_query", 99.0, 1.0, 0.2), comparables),
      "no comparable = undecidable = never flagged")
    assert(!queryExceedsComparable(
      ChildRes("dd12_lsh_quality", -1.0, 1.0, -1.0), comparables),
      "a crashed child is the window gate's business, not this gate's")
  }

  test("sf1Comparables reads SCALECHECK's sf1_isolated and fails soft") {
    // the committed artifact at the repo root must parse into per-query
    // comparables keyed by FULL name (ChildRes.name's key space)
    val fromRepo = Bench.sf1Comparables("SCALECHECK.json")
    assert(fromRepo.nonEmpty, "repo SCALECHECK.json carries sf1_isolated")
    assert(fromRepo.contains("dd12_lsh_quality"))
    assert(fromRepo.values.forall(_ > 0))
    // a missing artifact disables the gate instead of crashing the bench
    assert(Bench.sf1Comparables("/nonexistent/SCALECHECK.json").isEmpty)
  }

  test("qPollutedFrag renders a valid JSON fragment, empty when clean") {
    assert(Bench.qPollutedFrag(Nil) === "")
    val frag = Bench.qPollutedFrag(Seq("dd12", "dd2"))
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{" + frag.stripSuffix(",") + "}")
    assert(n.path("q_polluted").size() === 2)
    assert(n.path("q_polluted").get(0).asText() === "dd12")
  }

  test("mergePasses sums the adaptive extra-rep spend across passes") {
    val p1 = pass(Seq(("a", 2.0, 1.1)), 1.2).copy(extraReps = 3)
    val p2 = pass(Seq(("a", 2.5, 1.0)), 1.1).copy(extraReps = 2)
    assert(Bench.mergePasses(Seq(p1, p2)).extraReps === 5)
  }
}
