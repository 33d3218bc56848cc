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
    * @param localSolveVerts when > 0, a graph with at most this many
    *   vertices (and a bounded edge count) is collected and iterated on
    *   driver CSR arrays — one collect instead of numIter fixed-cost
    *   supersteps (same adaptive pattern as CC/LPA). Per-vertex sums run
    *   in deterministic CSR order instead of shuffle-merge order, so
    *   values can differ from the distributed path in the last float
    *   ulps — exactly the nondeterminism the distributed path already
    *   has between its own runs (parity pinned to 1e-12 in
    *   FastPathEquivalenceSpec). Off by default; tiny-graph callers opt
    *   in, web-scale graphs fail the bound and stay distributed. */
  def run(
      edges: DataFrame,
      vertices: Option[DataFrame] = None,
      damping: Double = 0.85,
      numIter: Int = 20,
      tol: Double = 0.0,
      sink: MetricsSink = MetricsSink.discard,
      localSolveVerts: Long = 0): Result = {

    val canon = EdgeOps.compress(edges)

    if (localSolveVerts > 0) {
      val canonC = canon.ckpt
      val nEdges = canonC.count()
      val spark = edges.sparkSession
      import spark.implicits._
      if (nEdges <= 10_000_000L) vertices match {
        case None =>
          // default universe = the canon's own endpoints: derive it from
          // the (bounded) collect instead of a distinct+ckpt+count+collect
          // chain. A LARGE edge table still pre-checks the vertex bound
          // distributively before committing the boxed collect.
          val preOk = nEdges <= 1_000_000L ||
            EdgeOps.vertices(canonC).count() <= localSolveVerts
          if (preOk) {
            val es = canonC.select("src", "dst", "weight").collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            val vSet = new java.util.TreeSet[java.lang.Long]()
            es.foreach { e => vSet.add(e._1); vSet.add(e._2) }
            if (vSet.size() <= localSolveVerts) {
              val vs = new Array[Long](vSet.size())
              var i = 0
              val it = vSet.iterator()
              while (it.hasNext) { vs(i) = it.next(); i += 1 }
              val (ranks, its) =
                localPageRank(vs, es, damping, numIter, tol, sink)
              return Result(
                vs.indices.map(i => (vs(i), ranks(i))).toDF("v", "rank"),
                its)
            }
          }
        case Some(vdf) =>
          val verts0 = vdf.select(col("v")).distinct().ckpt
          if (verts0.count() <= localSolveVerts) {
            val vs = verts0.collect().map(_.getLong(0))
            val inVs = vs.toSet
            val es = canonC.select("src", "dst", "weight").collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              .filter(e => inVs(e._1) && inVs(e._2))
            val (ranks, its) =
              localPageRank(vs, es, damping, numIter, tol, sink)
            return Result(
              vs.indices.map(i => (vs(i), ranks(i))).toDF("v", "rank"), its)
          }
      }
      // bound failed: reuse the materialized canon below
      return runDistributed(canonC, vertices, damping, numIter, tol, sink)
    }
    runDistributed(canon, vertices, damping, numIter, tol, sink)
  }

  private def runDistributed(
      canon: DataFrame,
      vertices: Option[DataFrame],
      damping: Double,
      numIter: Int,
      tol: Double,
      sink: MetricsSink): Result = {

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
    val parts = canon.sparkSession.sessionState.conf.numShufflePartitions
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

  /** Driver-side mirror of the distributed superstep: symmetrized CSR
    * with per-edge shares w/wdeg(src), dangling mass spread uniformly,
    * r' = (1-d)/n + d*(gathered + dMass/n). Same semantics as
    * runDistributed (see run() scaladoc for the float-order caveat).
    * Returns ranks indexed as `vs` plus the iteration count. */
  private[graft] def localPageRank(
      vs: Array[Long],
      es: Array[(Long, Long, Double)],
      damping: Double,
      numIter: Int,
      tol: Double,
      sink: MetricsSink): (Array[Double], Int) = {
    val n = vs.length
    if (n == 0) return (Array.empty, 0)
    // dense index = position in the caller's vs order
    val posOf = new java.util.HashMap[Long, Int](n * 2)
    vs.indices.foreach(i => posOf.put(vs(i), i))
    def idx(v: Long): Int = posOf.get(v)
    // directed adjacency = both directions of every canonical edge
    // (self-loops twice, exactly EdgeOps.symmetrize)
    val outDeg = new Array[Int](n)
    es.foreach { case (s, d, _) => outDeg(idx(s)) += 1; outDeg(idx(d)) += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + outDeg(i); i += 1 }
    val nbr = new Array[Int](off(n))
    val ew = new Array[Double](off(n))
    val fill = java.util.Arrays.copyOf(off, n)
    es.foreach { case (s, d, w) =>
      val si = idx(s); val di = idx(d)
      nbr(fill(si)) = di; ew(fill(si)) = w; fill(si) += 1
      nbr(fill(di)) = si; ew(fill(di)) = w; fill(di) += 1
    }
    // weighted degree = sum of incident weights (self-loop counts 2w);
    // per-edge share w/wdeg(src) precomputed exactly as the distributed
    // `shares` projection does, so each edge contributes (w/wdeg)*r with
    // the same per-edge rounding
    val wdeg = new Array[Double](n)
    i = 0
    while (i < n) {
      var k = off(i)
      while (k < off(i + 1)) { wdeg(i) += ew(k); k += 1 }
      i += 1
    }
    val share = new Array[Double](off(n))
    i = 0
    while (i < n) {
      var k = off(i)
      while (k < off(i + 1)) { share(k) = ew(k) / wdeg(i); k += 1 }
      i += 1
    }
    var ranks = Array.fill(n)(1.0 / n)
    var it = 0
    var converged = false
    while (it < numIter && !converged) {
      val t0 = System.nanoTime()
      var dMass = 0.0
      i = 0
      while (i < n) { if (off(i) == off(i + 1)) dMass += ranks(i); i += 1 }
      val mass = new Array[Double](n)
      i = 0
      while (i < n) {
        if (off(i) < off(i + 1)) {
          val r = ranks(i)
          var k = off(i)
          while (k < off(i + 1)) { mass(nbr(k)) += share(k) * r; k += 1 }
        }
        i += 1
      }
      val next = new Array[Double](n)
      var delta = 0.0
      i = 0
      while (i < n) {
        next(i) = (1.0 - damping) / n +
          damping * (mass(i) + dMass / n)
        delta += math.abs(next(i) - ranks(i))
        i += 1
      }
      sink.add(IterMetric("pagerank", 0, it, messages = -1,
        movesAccepted = -1, frontier = n.toLong,
        qualityDelta = if (tol > 0.0) delta else -1.0,
        seconds = (System.nanoTime() - t0) / 1e9))
      ranks = next
      it += 1
      if (tol > 0.0 && delta < tol) converged = true
    }
    (ranks, it)
  }
}
