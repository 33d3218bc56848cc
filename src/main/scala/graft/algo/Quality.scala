package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps

/** Partition quality functions: modularity and CPM.
  *
  * The reference's run() emits a placeholder quality_score of 1.0
  * (/root/reference/src/core/algorithm/hit_leiden.rs:69-75, acknowledged
  * pending in README.md:152); its move *gain* however is real generalized
  * modularity (hit_leiden.rs:250-255), and the HIT-Leiden paper defines
  * both quality functions (Def. 1,
  * docs/papers/2601.08554/2601.08554-docling.md:143). We implement real
  * scoring — two aggregations each, no iteration:
  *
  *   modularity: Q = W_in/m − γ · Σ_C (d_C / 2m)²
  *   CPM:        Q = W_in − γ · Σ_C n_C·(n_C−1)/2
  *
  * where m = total edge weight, W_in = total intra-community weight
  * (self-loops count once), d_C = Σ weighted degree of members (self-loop
  * counts 2w), n_C = member count.
  */
object Quality {

  /** @param canonical canonical undirected edge table (src<=dst, merged)
    * @param assign (v, community)
    * @param localSolveEdges when > 0 and the canonical table has at most
    *   this many rows, both inputs are collected and the three sums run
    *   on the driver — one collect instead of three join+agg jobs. The
    *   value is identical for integer-valued weights (exact sums in any
    *   order — the compressed-multiplicity graphs every caller scores);
    *   fractional weights could differ in the last ulp, same as the
    *   distributed path's own shuffle-order nondeterminism. Off by
    *   default; tiny-graph callers opt in.
    */
  def modularity(canonical: DataFrame, assign: DataFrame,
      gamma: Double = 1.0, localSolveEdges: Long = 0): Double = {
    localParts(canonical, assign, localSolveEdges) match {
      case Some((es, commOf)) => return modularityFromArrays(es, commOf, gamma)
      case None =>
    }
    val m = EdgeOps.totalWeight(canonical)
    if (m == 0.0) return 0.0
    val a = assign.select(col("v"), col("community"))
    val wIn = intraWeight(canonical, a)
    val adj = EdgeOps.symmetrize(canonical)
    val commDeg = EdgeOps.degrees(adj).join(a, "v")
      .groupBy("community").agg(sum("deg").as("cdeg"))
    val sumSqRow = commDeg.agg(sum(col("cdeg") * col("cdeg"))).collect()(0)
    val sumSq = if (sumSqRow.isNullAt(0)) 0.0 else sumSqRow.getDouble(0)
    wIn / m - gamma * sumSq / (4.0 * m * m)
  }

  /** Modularity of the all-singletons partition in closed form: with
    * every vertex its own community, intra-community weight is the
    * self-loop weight alone and d_C = d_v, so
    *   Q = W_self/m − γ · Σ_v (d_v / 2m)²
    * — two aggregations over the canonical table, no assignment join.
    * Same value as `modularity(canonical, v→v)` (the generic path is
    * equivalence-tested against this in QualitySpec); used where the
    * singleton baseline is wanted without paying the join. */
  def singletonModularity(canonical: DataFrame, gamma: Double = 1.0): Double = {
    val mRow = canonical.agg(sum("weight"),
      sum(when(col("src") === col("dst"), col("weight")))).collect()(0)
    val m = if (mRow.isNullAt(0)) 0.0 else mRow.getDouble(0)
    if (m == 0.0) return 0.0
    val wSelf = if (mRow.isNullAt(1)) 0.0 else mRow.getDouble(1)
    val adj = EdgeOps.symmetrize(canonical)
    val sqRow = EdgeOps.degrees(adj)
      .agg(sum(col("deg") * col("deg"))).collect()(0)
    val sumSq = if (sqRow.isNullAt(0)) 0.0 else sqRow.getDouble(0)
    wSelf / m - gamma * sumSq / (4.0 * m * m)
  }

  /** Constant Potts Model quality (unnormalized, standard form).
    * `localSolveEdges`: same adaptive driver-side path as [[modularity]]. */
  def cpm(canonical: DataFrame, assign: DataFrame,
      gamma: Double = 1.0, localSolveEdges: Long = 0): Double = {
    localParts(canonical, assign, localSolveEdges) match {
      case Some((es, commOf)) => return cpmFromArrays(es, commOf, gamma)
      case None =>
    }
    val a = assign.select(col("v"), col("community"))
    val wIn = intraWeight(canonical, a)
    val sizesRow = a.groupBy("community").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0)
    val pairs = if (sizesRow.isNullAt(0)) 0.0 else
      sizesRow.get(0) match {
        case d: java.lang.Double => d.doubleValue()
        case b: java.math.BigDecimal => b.doubleValue()
        case l: java.lang.Long => l.doubleValue()
      }
    wIn - gamma * pairs
  }

  /** Driver-side modularity over collected canonical edges + an
    * assignment map — the same sums as the distributed path, exact for
    * integer-valued weights. Mirrors the inner-join semantics: edges
    * with an unassigned endpoint don't count in wIn; unassigned
    * vertices carry no degree. Callers that already hold the collected
    * graph (driver queries, Leiden's level-0 local solve) score for
    * free through this. */
  private[graft] def modularityFromArrays(es: Array[(Long, Long, Double)],
      commOf: scala.collection.Map[Long, Long], gamma: Double): Double = {
    var m = 0.0
    var wIn = 0.0
    val degOf = scala.collection.mutable.HashMap.empty[Long, Double]
    es.foreach { case (s, d, w) =>
      m += w
      val cs = commOf.get(s); val cd = commOf.get(d)
      if (cs.isDefined && cd.isDefined && cs.get == cd.get) wIn += w
      // symmetrized degree: w at each endpoint (self-loop twice)
      if (cs.isDefined) degOf(s) = degOf.getOrElse(s, 0.0) + w
      if (cd.isDefined) degOf(d) = degOf.getOrElse(d, 0.0) + w
    }
    if (m == 0.0) return 0.0
    val cdeg = scala.collection.mutable.HashMap.empty[Long, Double]
    degOf.foreach { case (v, dv) =>
      val c = commOf(v)
      cdeg(c) = cdeg.getOrElse(c, 0.0) + dv
    }
    var sumSq = 0.0
    cdeg.valuesIterator.foreach(d => sumSq += d * d)
    wIn / m - gamma * sumSq / (4.0 * m * m)
  }

  /** Driver-side CPM — see [[modularityFromArrays]]. */
  private[graft] def cpmFromArrays(es: Array[(Long, Long, Double)],
      commOf: scala.collection.Map[Long, Long], gamma: Double): Double = {
    var wIn = 0.0
    es.foreach { case (s, d, w) =>
      val cs = commOf.get(s); val cd = commOf.get(d)
      if (cs.isDefined && cd.isDefined && cs.get == cd.get) wIn += w
    }
    val csize = scala.collection.mutable.HashMap.empty[Long, Long]
    commOf.valuesIterator.foreach(c => csize(c) = csize.getOrElse(c, 0L) + 1L)
    var pairs = 0.0
    // n*(n-1)/2 over longs: n(n-1) is even, so the integer division is
    // the exact binomial (matches the SQL BIGINT arithmetic)
    csize.valuesIterator.foreach(s => pairs += (s * (s - 1) / 2).toDouble)
    wIn - gamma * pairs
  }

  /** Collect gate for the local paths: when the (already-materialized)
    * canonical table fits, collects it plus the assignment. */
  private def localParts(canonical: DataFrame, assign: DataFrame,
      localSolveEdges: Long): Option[(Array[(Long, Long, Double)],
      scala.collection.mutable.HashMap[Long, Long])] = {
    if (localSolveEdges <= 0) return None
    // callers opting in pass an already-materialized (ckpt'd) canonical
    // table, so the count gate and the collect below are both cheap reads
    if (canonical.count() > localSolveEdges) return None
    val commOf = scala.collection.mutable.HashMap.empty[Long, Long]
    assign.select(col("v"), col("community")).collect()
      .foreach(r => commOf.put(r.getLong(0), r.getLong(1)))
    val es = canonical.select(col("src"), col("dst"), col("weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    Some((es, commOf))
  }

  private def intraWeight(canonical: DataFrame, assign: DataFrame): Double = {
    val r = canonical
      .join(assign.select(col("v").as("src"), col("community").as("cu")), "src")
      .join(assign.select(col("v").as("dst"), col("community").as("cv")), "dst")
      .where(col("cu") === col("cv"))
      .agg(sum("weight")).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }
}
