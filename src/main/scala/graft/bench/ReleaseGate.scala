package graft.bench

/** Benchmark release gate — the analog of the reference's
  * compare_baseline + gate eligibility
  * (/root/reference/src/benchmark/compare.rs:4-28,
  * /root/reference/src/benchmark/release_gate.rs:4-15;
  * target threshold specs/001-hit-leiden-rust/spec.md:257-260: promote
  * only on >= minGain x median throughput against a frozen baseline,
  * measured on pinned hardware, never against a live-query source).
  */
object ReleaseGate {

  final case class Eligibility(eligible: Boolean, reason: String)

  final case class Outcome(
      eligibility: Eligibility,
      /** candidate / baseline median throughput */
      gain: Double,
      /** eligible && gain >= minGain */
      promote: Boolean)

  /** Reference reason codes (release_gate.rs): a gate run must be on
    * pinned hardware and must not read from a live query source.
    * BOX_CONTENDED is ours: a run started on a loaded box can't
    * distinguish contention from regression, so it is ineligible for
    * promotion (the gain is still computed and reported). */
  def eligibility(hardwarePinned: Boolean, source: String,
      boxContended: Boolean = false): Eligibility =
    if (!hardwarePinned) Eligibility(eligible = false, "HARDWARE_NOT_PINNED")
    else if (source == "live-query")
      Eligibility(eligible = false, "LIVE_QUERY_SOURCE")
    else if (boxContended) Eligibility(eligible = false, "BOX_CONTENDED")
    else Eligibility(eligible = true, "ok")

  /** @param candidateThroughput median throughput of the candidate build
    * @param baselineThroughput frozen-baseline median throughput
    * @param minGain promotion threshold (reference target: 2.0) */
  def evaluate(candidateThroughput: Double, baselineThroughput: Double,
      hardwarePinned: Boolean, source: String,
      minGain: Double = 2.0, boxContended: Boolean = false): Outcome = {
    require(baselineThroughput > 0, "baseline throughput must be > 0")
    val e = eligibility(hardwarePinned, source, boxContended)
    val gain = candidateThroughput / baselineThroughput
    Outcome(e, gain, e.eligible && gain >= minGain)
  }
}
