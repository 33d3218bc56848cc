package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps

/** Faithful delta-form supergraph maintenance — the reference's
  * inc_aggregation (/root/reference/src/core/algorithm/hit_leiden.rs:
  * 487-563) and def_update (hit_leiden.rs:565-599) as pure relational
  * jobs.
  *
  * Note the reference never actually reaches these in its public run()
  * (PartitionState::identity pins levels=1, so the level loop exits before
  * aggregation); they are implemented here to complete the specified
  * contract. Guard semantics follow the code exactly: a refined vertex v
  * emits (-w on the previous subcommunity pair, +w on the current pair)
  * for each neighbor n unless both are refined-and-changed and v > n
  * (dedup: `cur(n)==pre(n) || v < n`, hit_leiden.rs:509-511).
  *
  * Invariant (tested): contract(G, sPre) + deltaH == contract(G, sPre')
  * when deltaG is empty and R = {v : sCur(v) != sPre(v)}.
  */
object IncAggregation {

  /** @param adj   symmetrized adjacency of the level graph
    * @param delta signed delta edges (may be empty)
    * @param sPre  (v, sc) previous subcommunity mapping
    * @param sCur  (v, sc) current subcommunity mapping
    * @param refined (v) the R set
    * @param materialize checkpoint deltaH before returning (default).
    *   A caller that immediately collects deltaH (the warm mirror path)
    *   passes false so the delta join pipeline is evaluated ONCE — by
    *   its own collect — instead of ckpt + collect.
    * @return (deltaH canonical signed edges, sPre' updated mapping)
    */
  def apply(adj: DataFrame, delta: DataFrame, sPre: DataFrame,
      sCur: DataFrame, refined: DataFrame,
      eps: Double = 1e-9, materialize: Boolean = true): (DataFrame, DataFrame) = {

    val preSrc = sPre.select(col("v").as("src"), col("sc").as("preU"))
    val preDst = sPre.select(col("v").as("dst"), col("sc").as("preN"))
    val curSrc = sCur.select(col("v").as("src"), col("sc").as("curU"))
    val curDst = sCur.select(col("v").as("dst"), col("sc").as("curN"))

    // 1. delta edges mapped through the previous mapping (lines 499-504).
    // Delta-bound shapes throughout: the (small) delta/refined sides are
    // broadcast-built, so the V-sized mapping tables stream map-side and
    // are never shuffled.
    val deltaMapped = broadcast(broadcast(delta).join(preSrc, "src"))
      .join(preDst, "dst")
      .select(col("preU").as("src"), col("preN").as("dst"),
        coalesce(col("weight"), lit(1.0)).as("weight"))

    // 2. refined vertices re-seat their incident edges (lines 507-525).
    // Self-loops are handled in a separate branch: the symmetrized
    // adjacency stores a self-loop as two identical rows, and the
    // reference's dedup guard (`cur==pre || i<j`) drops BOTH when the
    // vertex is refined-and-changed — which would lose the -w/+w
    // re-seating of its self-loop entirely. Emit it exactly once instead
    // (distinct collapses the two identical rows).
    val rAdj0 = adj
      .where(col("src") =!= col("dst"))
      .join(broadcast(refined.select(col("v").as("src"))), Seq("src"),
        "left_semi")
    val rAdj = broadcast(broadcast(broadcast(broadcast(rAdj0)
      .join(preSrc, "src"))
      .join(preDst, "dst"))
      .join(curSrc, "src"))
      .join(curDst, "dst")
      .where(col("curN") === col("preN") || col("src") < col("dst"))
    val negEdges = rAdj.select(col("preU").as("src"), col("preN").as("dst"),
      negate(col("weight")).as("weight"))
    val posEdges = rAdj.select(col("curU").as("src"), col("curN").as("dst"),
      col("weight"))
    val rLoop = broadcast(broadcast(
      adj.where(col("src") === col("dst")).distinct()
        .join(broadcast(refined.select(col("v").as("src"))), Seq("src"),
          "left_semi"))
      .join(preSrc, "src"))
      .join(curSrc, "src")
    val negLoops = rLoop.select(col("preU").as("src"), col("preU").as("dst"),
      negate(col("weight")).as("weight"))
    val posLoops = rLoop.select(col("curU").as("src"), col("curU").as("dst"),
      col("weight"))

    // 3. compress (lines 533-546) — EdgeOps.compress is exactly it
    val deltaH0 = EdgeOps.compress(
      deltaMapped.unionAll(negEdges).unionAll(posEdges)
        .unionAll(negLoops).unionAll(posLoops), eps)
    val deltaH = if (materialize) deltaH0.ckpt else deltaH0

    // 4. sPre' = sPre overridden by sCur on R (lines 527-531). Returned
    // LAZY: when R = {v: sCur != sPre} (the live-path contract) this
    // equals sCur and callers use that directly.
    val nextPre = sPre
      .join(broadcast(refined.withColumn("_r", lit(1))), Seq("v"), "left")
      .join(sCur.select(col("v"), col("sc").as("scCur")), "v")
      .select(col("v"),
        when(col("_r").isNotNull, col("scCur")).otherwise(col("sc")).as("sc"))
    (deltaH, nextPre)
  }

  /** def_update: top-down re-pointing f_p(v) = f_{p+1}(s_p(v)) for changed
    * vertices, pushing the changed set down via the inverse mapping. The
    * reference's O(n * |B|) inverse scan (hit_leiden.rs:586-596) becomes an
    * indexed join. Levels are 0-based, level 0 = base graph.
    *
    * @param fLevels per-level (v, f) community mappings
    * @param sLevels per-level (v, sc) subcommunity mappings
    * @param bLevels per-level (v) changed sets
    * @return updated (fLevels, bLevels)
    */
  def defUpdate(fLevels: Vector[DataFrame], sLevels: Vector[DataFrame],
      bLevels: Vector[DataFrame]): (Vector[DataFrame], Vector[DataFrame]) = {
    val pMax = fLevels.length
    var fsOut = fLevels
    var bsOut = bLevels
    for (p <- (0 until pMax).reverse) {
      if (p < pMax - 1) {
        // f_p(v) <- f_{p+1}(s_p(v)) for v in B_p
        val sp = sLevels(p).select(col("v"), col("sc"))
        val fNext = fsOut(p + 1).select(col("v").as("sc"), col("f").as("fNew"))
        val updated = fsOut(p)
          .join(bsOut(p).withColumn("_b", lit(1)), Seq("v"), "left")
          .join(sp, "v")
          .join(fNext, Seq("sc"), "left")
          .select(col("v"),
            when(col("_b").isNotNull && col("fNew").isNotNull, col("fNew"))
              .otherwise(col("f")).as("f"))
          .ckpt
        fsOut = fsOut.updated(p, updated)
      }
      if (p > 0) {
        // B_{p-1} += s_{p-1}^{-1}(B_p): an indexed join, not an O(n) scan
        val inv = sLevels(p - 1)
          .join(bsOut(p).select(col("v").as("sc")), Seq("sc"), "left_semi")
          .select("v")
        bsOut = bsOut.updated(p - 1,
          bsOut(p - 1).unionAll(inv).distinct().ckpt)
      }
    }
    (fsOut, bsOut)
  }
}
