package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Byte-estimated gating for EXPLICIT broadcasts.
  *
  * The engine's iterative operators broadcast mid-pipeline tables whose
  * row counts are known (just collected/checkpointed) but whose plan
  * stats are gone (Ckpt drops them), so Catalyst's auto-broadcast can't
  * decide. A raw row-count gate encodes one box's memory in a constant;
  * this gates on ESTIMATED DESERIALIZED BYTES (rows x caller-supplied
  * payload width) against a budget derived from the JVM actually running
  * — scale-agnostic where the row-count constants were not.
  */
object Bcast {

  /** Deserialized-payload budget for one explicit broadcast: an eighth
    * of the JVM max heap, floored at 64 MB (a small test heap must still
    * broadcast genuinely tiny tables) and capped at 512 MB — past that,
    * build+ship time loses to a shuffle regardless of available memory,
    * and executors on a real cluster don't grow with the driver's heap. */
  def budgetBytes: Long =
    // test hook: lets a spec shrink the budget to force (and verify) the
    // non-broadcast fallback plans without a multi-GB fixture
    sys.props.get("graft.bcast.budgetBytes").flatMap(_.toLongOption)
      .getOrElse(
        math.min(math.max(Runtime.getRuntime.maxMemory() / 8, 64L << 20),
          512L << 20))

  /** Broadcast `df` iff `rows * bytesPerRow` fits the budget. */
  def ifFits(df: DataFrame, rows: Long, bytesPerRow: Long): DataFrame =
    if (fits(rows, bytesPerRow)) broadcast(df) else df

  def fits(rows: Long, bytesPerRow: Long): Boolean =
    rows <= budgetBytes / bytesPerRow
}
