package graft.run

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition validation — the engine-side equivalent of the reference's
  * invariants + equivalence modules
  * (/root/reference/src/core/validation/invariants.rs:3-12,
  * equivalence.rs:5-28).
  *
  * Deterministic policy: exact partition identity after canonical
  * relabeling (each community renamed to its minimum member id — ids are
  * internal, structure is the contract). Throughput policy: quality delta
  * within tolerance (reference default 0.001).
  */
object Validate {

  final case class Outcome(ok: Boolean, reason: String)

  /** Hard invariants: every vertex exactly one community; community ids
    * are vertex ids of the graph (the non-dense analog of the reference's
    * "id < node_count", invariants.rs:3-12). NOT "a current member's id":
    * under BSP movement a founder vertex v can legitimately leave
    * community v in the same sweep another vertex joins it — the
    * algorithm only guarantees ids come from the vertex id space. */
  def invariants(assign: DataFrame): Outcome = invariants(assign, -1L)

  /** Incremental-aware variant: with largest-keeps-id splits and
    * watermark-allocated fresh ids, a community id can be *historical*
    * (its eponymous vertex was deleted) or *synthetic* (allocated above
    * the id watermark) — both live in [0, maxId]. Pass the state's id
    * watermark to accept them; `maxId < 0` keeps the strict cold-start
    * rule (ids must be current vertex ids). */
  def invariants(assign: DataFrame, maxId: Long): Outcome = {
    val n = assign.count()
    val distinctV = assign.select("v").distinct().count()
    if (n != distinctV)
      return Outcome(ok = false, s"duplicate assignments: $n rows, $distinctV vertices")
    val commIds = assign.select(col("community").as("v")).distinct()
    val outOfVerts = commIds
      .join(assign.select("v").distinct(), Seq("v"), "left_anti")
    val bad = if (maxId < 0) outOfVerts
      else outOfVerts.where(col("v") > maxId || col("v") < 0)
    val badIds = bad.count()
    if (badIds != 0)
      return Outcome(ok = false, s"$badIds community ids are outside the " +
        s"allowed id space (vertex ids" +
        (if (maxId >= 0) s" plus [0, $maxId])" else ")"))
    Outcome(ok = true, "ok")
  }

  /** Canonical relabel: community -> min member id. */
  def canonicalize(assign: DataFrame): DataFrame = {
    val minOf = assign.groupBy("community").agg(min("v").as("canon"))
    assign.join(minOf, "community").select(col("v"),
      col("canon").as("community"))
  }

  /** Deterministic-mode equivalence: exact canonical identity. */
  def equivalentExact(ref: DataFrame, cand: DataFrame): Outcome = {
    val a = canonicalize(ref)
    val b = canonicalize(cand)
    val diff = a.unionAll(b).groupBy("v", "community")
      .agg(count(lit(1)).as("n")).where(col("n") =!= 2).count()
    if (diff == 0) Outcome(ok = true, "exact match")
    else Outcome(ok = false, s"$diff (v, community) rows differ")
  }

  /** Throughput-mode equivalence: |qRef - qCand| <= tol
    * (/root/reference/src/core/validation/equivalence.rs:21-27). */
  def equivalentQuality(qRef: Double, qCand: Double,
      tol: Double = 0.001): Outcome =
    if (math.abs(qRef - qCand) <= tol) Outcome(ok = true, "within tolerance")
    else Outcome(ok = false, s"quality delta ${math.abs(qRef - qCand)} > $tol")
}
