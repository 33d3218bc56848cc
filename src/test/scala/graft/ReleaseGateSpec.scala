package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.ReleaseGate

/** Contract tests mirroring the reference's gate behavior
  * (tests/integration/test_release_gate_live_query_ineligible.rs,
  * tests/contract/test_compare_baseline.rs). */
class ReleaseGateSpec extends AnyFunSuite {

  test("live-query source is ineligible with the reference reason code") {
    val o = ReleaseGate.evaluate(10.0, 1.0, hardwarePinned = true,
      source = "live-query")
    assert(!o.eligibility.eligible)
    assert(o.eligibility.reason == "LIVE_QUERY_SOURCE")
    assert(!o.promote) // gain alone never promotes an ineligible run
    assert(o.gain == 10.0)
  }

  test("unpinned hardware is ineligible") {
    val o = ReleaseGate.evaluate(10.0, 1.0, hardwarePinned = false,
      source = "frozen-snapshot")
    assert(o.eligibility.reason == "HARDWARE_NOT_PINNED")
    assert(!o.promote)
  }

  test("promotes only at >= minGain on an eligible run") {
    val ok = ReleaseGate.evaluate(2.1, 1.0, hardwarePinned = true,
      source = "frozen-snapshot")
    assert(ok.promote && ok.eligibility.eligible)
    val slow = ReleaseGate.evaluate(1.9, 1.0, hardwarePinned = true,
      source = "frozen-snapshot")
    assert(!slow.promote && slow.eligibility.eligible)
  }

  test("rejects a zero baseline") {
    intercept[IllegalArgumentException] {
      ReleaseGate.evaluate(1.0, 0.0, hardwarePinned = true, source = "s")
    }
  }
}
