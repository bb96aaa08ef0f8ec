package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's structural drift triage depends on parsing the committed
  * anchor table — a silent format drift in BENCH_ANCHORS.md would turn
  * the breach check into a no-op. Pin the parse against the repo copy. */
class BenchAnchorsSpec extends AnyFunSuite {

  test("BENCH_ANCHORS.md parses: all 43 anchors, spot values exact") {
    val anchors = Bench.readAnchors("BENCH_ANCHORS.md")
    assert(anchors.size == 43,
      s"expected 43 anchors, got ${anchors.size} (cwd=${sys.props("user.dir")})")
    assert(anchors("triangle_count") == 8.44)
    assert(anchors("event_funnel") == 0.81)
    assert(anchors("dedup_clusters_star") == 3.83)
    assert(anchors("corpus_lifecycle") == 4.98) // round-14 addition
  }

  test("a missing anchors file disables the check instead of failing the bench") {
    assert(Bench.readAnchors("/no/such/file.md").isEmpty)
  }

  test("the breach rule: >1.5x over anchor AND >1s over") {
    // the rule lives inline in Bench.main; replicate its arithmetic here
    // as the documented contract so a future edit that changes one half
    // of the rule shows up as a failing expectation
    def breach(v: Double, a: Double): Boolean = v > a * 1.5 && v > a + 1.0
    assert(!breach(3.0, 2.41))  // 1.24x — under ratio
    assert(breach(5.63, 2.41))  // the r13 compact_roundtrip reading
    assert(!breach(1.2, 0.5))   // 2.4x but only +0.7s — sub-second noise
    assert(breach(9.49, 3.83))  // the r13 dedup_clusters_star reading
  }
}
