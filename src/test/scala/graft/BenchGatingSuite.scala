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
}
