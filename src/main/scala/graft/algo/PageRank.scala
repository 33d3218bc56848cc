package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps
import graft.run.{IterMetric, MetricsSink}

/** Weighted PageRank as a DataFrame power iteration.
  *
  * The reference repo does not ship PageRank; the north rule adds it. The
  * semantics implemented (and oracled in tests by a sequential in-test
  * power iteration) are the standard ones:
  *
  *   r_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} r_t(u) * w(u,v)/wdeg(u)
  *                                + danglingMass_t / N )
  *
  * over the symmetrized adjacency (an undirected link graph: each edge
  * contributes mass both ways, proportionally to weight). Dangling
  * vertices (isolated vertices supplied via `vertices`) spread their mass
  * uniformly. Scores over all supplied vertices sum to 1 at every step.
  *
  * Scale notes: the per-iteration plan is one hash join (ranks are
  * re-shuffled to the adjacency's src partitioning) + one hash aggregation
  * on dst. `ranks` is localCheckpoint'ed every iteration to keep the plan
  * flat; the adjacency is cached once by the caller. Convergence is the
  * L1 delta, a single scalar agg piggybacked on the same pass.
  */
object PageRank {

  final case class Result(ranks: DataFrame, iterations: Int)

  /** @param edges canonical undirected edge table (src, dst, weight)
    * @param vertices optional full vertex universe (v) — include to give
    *   isolated vertices their (1-d)/N + dangling share; defaults to the
    *   vertices present in `edges`.
    * @param numIter fixed iteration count when tol <= 0, else a cap.
    * @param tol L1 convergence threshold (sum |r_t+1 - r_t| < tol stops).
    */
  def run(
      edges: DataFrame,
      vertices: Option[DataFrame] = None,
      damping: Double = 0.85,
      numIter: Int = 20,
      tol: Double = 0.0,
      sink: MetricsSink = MetricsSink.discard): Result = {

    val canon = EdgeOps.compress(edges)
    val adj = EdgeOps.symmetrize(canon)
      .ckpt
    val verts = vertices.getOrElse(EdgeOps.vertices(canon)).select(col("v"))
      .ckpt
    val n = verts.count().toDouble
    if (n == 0) return Result(verts.withColumn("rank", lit(0.0)), 0)

    // out-weight per vertex; isolated vertices have none -> dangling
    val wdeg = EdgeOps.degrees(adj)
    // pre-join the per-edge share w/wdeg(src) once (static across
    // iterations) and pre-partition it by the join key: the checkpointed
    // partitioning is reused every superstep, so only the small ranks
    // table is shuffled per iteration, never the edge table
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val shares = adj.join(wdeg, adj("src") === wdeg("v"))
      .select(col("src"), col("dst"), (col("weight") / col("deg")).as("share"))
      .repartition(parts, col("src"))
      .ckpt
    val dangling = verts.join(wdeg, Seq("v"), "left_anti").ckpt
    // computing dangling mass costs one driver job per iteration; skip it
    // entirely for the (overwhelmingly common) no-dangling case
    val hasDangling = !dangling.isEmpty

    var ranks = verts.withColumn("rank", lit(1.0 / n)).ckpt
    var it = 0
    var converged = false
    while (it < numIter && !converged) {
      val t0 = System.nanoTime()
      val dMass = if (!hasDangling) 0.0 else {
        val r = dangling.join(ranks, "v").agg(sum("rank")).collect()(0)
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }

      // shuffle_hash: build on the small ranks side; SMJ would re-sort
      // the static 2|E|-row shares table every iteration
      val contribs = shares.join(ranks.hint("shuffle_hash"),
          shares("src") === ranks("v"))
        .select(col("dst").as("v"), (col("share") * col("rank")).as("c"))
      val sums = contribs.groupBy("v").agg(sum("c").as("mass"))
      val newRanks = verts.join(sums, Seq("v"), "left")
        .select(col("v"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("mass"), lit(0.0)) + lit(dMass / n)))
            .as("rank"))
        .ckpt

      val delta =
        if (tol > 0.0) {
          newRanks.join(ranks.withColumnRenamed("rank", "old"), "v")
            .agg(sum(abs(col("rank") - col("old")))).collect()(0).getDouble(0)
        } else -1.0
      sink.add(IterMetric("pagerank", 0, it, messages = -1,
        movesAccepted = -1, frontier = n.toLong, qualityDelta = delta,
        seconds = (System.nanoTime() - t0) / 1e9))
      ranks = newRanks
      it += 1
      if (tol > 0.0 && delta >= 0.0 && delta < tol) converged = true
    }
    Result(ranks, it)
  }
}
