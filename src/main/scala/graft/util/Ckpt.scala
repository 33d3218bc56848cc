package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.GraftStatsReset

/** Eager localCheckpoint that also RESETS plan statistics.
  *
  * Why: Spark's `localCheckpoint` truncates lineage but preserves the
  * parent plan's computed `Statistics` on the resulting LogicalRDD
  * (SPARK-34810 behavior). Catalyst's size-only join estimate is a
  * *product* of child sizes, so in an iterative algorithm (superstep k's
  * assignment is built by joining superstep k-1's checkpointed outputs)
  * the preserved sizeInBytes compounds multiplicatively per sweep —
  * after ~10 sweeps the BigInt has millions of digits and the optimizer
  * spends minutes inside BigInteger.multiply during stats estimation
  * (observed: AdaptiveSparkPlanExec.reOptimize -> JoinSelection ->
  * canBroadcastBySize pinning the driver at 100% CPU).
  *
  * Dropping originStats makes the checkpointed leaf fall back to
  * spark.sql.defaultSizeInBytes, keeping every per-sweep plan's stats
  * O(number of joins) digits. Join-strategy quality is unaffected in
  * practice: AQE re-plans joins from *runtime* shuffle sizes anyway.
  */
object Ckpt {
  /** Suffix syntax: `df.ckpt` — reads like localCheckpoint at call sites. */
  implicit class DFCkpt(private val df: DataFrame) extends AnyVal {
    def ckpt: DataFrame = Ckpt(df)
  }

  def apply(df: DataFrame): DataFrame =
    GraftStatsReset.dropOriginStats(df.localCheckpoint(true))
}
