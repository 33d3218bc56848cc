package graft.run

import scala.collection.mutable.ArrayBuffer

/** One row of per-iteration run metrics. Fulfils the north rule's
  * "per-iteration checkpoints carrying lineage + metrics (messages sent,
  * moves accepted, modularity delta)". The reference only records wall
  * times (/root/reference/src/benchmark/hit_leiden_incremental.rs:44-78);
  * we record the per-superstep counters explicitly.
  */
case class IterMetric(
    algo: String,
    level: Int,
    iteration: Int,
    messages: Long, // rows exchanged in the gather join this superstep
    movesAccepted: Long, // assignments changed / labels updated
    frontier: Long, // active-set size entering the superstep
    qualityDelta: Double, // quality change (0 when not tracked)
    seconds: Double)

/** Mutable collector threaded through the driver-side iteration loops. */
final class MetricsSink {
  private val buf = ArrayBuffer.empty[IterMetric]
  def add(m: IterMetric): Unit = synchronized { buf += m }
  def all: Seq[IterMetric] = synchronized { buf.toSeq }
  def totalIterations(algo: String): Int = all.count(_.algo == algo)
}

object MetricsSink {
  /** A sink that is never read — for callers that don't care. Singleton so
    * callers can cheaply test `sink eq MetricsSink.discard` and skip
    * metric-only actions. */
  val discard: MetricsSink = new MetricsSink
}
