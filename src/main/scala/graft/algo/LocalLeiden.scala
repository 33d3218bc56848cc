package graft.algo

import scala.collection.mutable

/** Sequential deterministic Leiden on a driver-local edge list.
  *
  * Two roles:
  *
  *  1. The reference's **deterministic run mode** — the sequential
  *     movement loop of /root/reference/src/core/algorithm/
  *     hit_leiden.rs:223-280 (ascending-id rounds, immediate stat
  *     updates) and the ascending-degree singleton-merge refinement of
  *     hit_leiden.rs:399-482, with the deterministic tie-breaking of
  *     deterministic.rs:1-21 (best gain, ties to the smallest id). The
  *     BSP engine implements throughput-mode semantics; this is the
  *     exact-identity counterpart (equivalence.rs:14-20).
  *  2. The **top-of-hierarchy solver**: after one or two contractions a
  *     100 TB graph's supergraph has a few thousand vertices. Driving
  *     dozens of fixed-cost Spark jobs against it is pure overhead —
  *     collect it and solve sequentially (standard multilevel-partitioner
  *     practice). [[Leiden.run]] switches to this path for levels >= 1
  *     whose edge count is below `Config.localSolveEdges`.
  *
  * Everything is deterministic: iteration orders are sorted, no hash-map
  * iteration order leaks into results.
  */
object LocalLeiden {

  /** One hierarchy level solved fully in memory.
    *
    * @param edges    canonical undirected edges (src <= dst not required;
    *                 parallel edges allowed — they are merged here)
    * @param nodeSize vertex -> size in base vertices (absent = 1)
    * @param initial  vertex -> starting community (absent = own id)
    * @return final (vertex -> community) after the full local hierarchy
    */
  def solve(edges: Array[(Long, Long, Double)],
      nodeSize: Map[Long, Long],
      initial: Map[Long, Long],
      cfg: Leiden.Config): Map[Long, Long] = {

    // m2 is a GLOBAL constant of the whole hierarchy (contraction
    // preserves total weight), matching the distributed path
    val m2g = 2.0 * merge(edges).map(_._3).sum
    var lvlEdges = edges
    var lvlSize = nodeSize
    var lvlComm = initial
    var maps = List.empty[Map[Long, Long]] // per-level v -> subcomm
    var top = Map.empty[Long, Long]
    var level = 0
    var done = false
    while (!done && level < cfg.maxLevels) {
      val (comm, sub) = solveLevel(lvlEdges, lvlSize, lvlComm, m2g, cfg)
      val nSub = sub.values.toSet.size
      top = comm
      if (nSub == sub.size || level == cfg.maxLevels - 1) done = true
      else {
        maps ::= sub
        // contract: subcommunity -> supervertex
        val superEdges = mutable.ArrayBuffer.empty[(Long, Long, Double)]
        lvlEdges.foreach { case (u, v, w) =>
          superEdges += ((sub(u), sub(v), w))
        }
        lvlEdges = merge(superEdges.toArray)
        lvlSize = sub.toSeq.groupBy(_._2).map { case (sc, kv) =>
          sc -> kv.map(x => lvlSize.getOrElse(x._1, 1L)).sum
        }
        // supervertex inherits its members' community (all members share
        // one community: subcommunity is a within-community refinement)
        lvlComm = sub.map { case (v, sc) => sc -> comm(v) }
        level += 1
      }
    }
    // compose the hierarchy back down to base vertices
    maps.foldLeft(top) { (acc, m) => m.map { case (v, sc) => v -> acc(sc) } }
  }

  /** Merge parallel edges (canonical min/max ordering), drop ~0 weights. */
  private def merge(es: Array[(Long, Long, Double)])
      : Array[(Long, Long, Double)] = {
    val m = mutable.HashMap.empty[(Long, Long), Double]
    es.foreach { case (u, v, w) =>
      val k = if (u <= v) (u, v) else (v, u)
      m.update(k, m.getOrElse(k, 0.0) + w)
    }
    m.iterator.filter(kv => math.abs(kv._2) > 1e-12)
      .map { case ((u, v), w) => (u, v, w) }.toArray.sortBy(e => (e._1, e._2))
  }

  /** Movement + refinement for one level. Returns (community, subcomm)
    * per vertex. */
  private def solveLevel(edgesIn: Array[(Long, Long, Double)],
      nodeSize: Map[Long, Long], initial: Map[Long, Long], m2: Double,
      cfg: Leiden.Config): (Map[Long, Long], Map[Long, Long]) = {

    val es = merge(edgesIn)
    val verts: Array[Long] =
      es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = verts.length
    val idx = verts.zipWithIndex.toMap
    // symmetrized adjacency (self-loop twice, matching the CSR builder
    // in_memory.rs:36-48); self-loops excluded from move gathers but
    // counted in degrees (same convention as the BSP path)
    val nbrs = Array.fill(n)(mutable.ArrayBuffer.empty[(Int, Double)])
    val deg = new Array[Double](n)
    es.foreach { case (u, v, w) =>
      val (i, j) = (idx(u), idx(v))
      if (i != j) { nbrs(i) += ((j, w)); nbrs(j) += ((i, w)) }
      deg(i) += w; deg(j) += w // self-loop contributes 2w to deg
    }
    val sz = verts.map(v => nodeSize.getOrElse(v, 1L).toDouble)

    // community state: ids are vertex INDICES internally (dense), mapped
    // back to the original community labels at the end via min-member
    val comm = new Array[Int](n)
    val extComm = verts.map(v => initial.getOrElse(v, v)) // external label
    // group by external label -> dense community = min member index
    val byExt = (0 until n).groupBy(i => extComm(i))
    byExt.foreach { case (_, is) => val c = is.min; is.foreach(comm(_) = c) }
    val cdeg = new Array[Double](n)
    val csize = new Array[Double](n)
    (0 until n).foreach { i => cdeg(comm(i)) += deg(i); csize(comm(i)) += sz(i) }

    val gamma = cfg.gamma
    def moveGain(i: Int, from: Int, to: Int, wTo: Double,
        wCur: Double): Double =
      if (cfg.useCpm)
        (wTo - wCur) - gamma * sz(i) * (csize(to) - csize(from) + sz(i))
      else
        (wTo - wCur) / m2 +
          gamma * deg(i) * (cdeg(from) - deg(i) - cdeg(to)) / (m2 * m2)

    // --- movement: ascending-id rounds with immediate updates
    // (hit_leiden.rs:223-280)
    val active = Array.fill(n)(true)
    var anyActive = true
    var rounds = 0
    val wByComm = mutable.HashMap.empty[Int, Double]
    while (anyActive && rounds < cfg.maxSweeps * 4) {
      anyActive = false
      var i = 0
      while (i < n) {
        if (active(i)) {
          active(i) = false
          wByComm.clear()
          nbrs(i).foreach { case (j, w) =>
            wByComm.update(comm(j), wByComm.getOrElse(comm(j), 0.0) + w)
          }
          val cur = comm(i)
          val wCur = wByComm.getOrElse(cur, 0.0)
          var bestC = cur
          var bestG = 0.0
          wByComm.toSeq.sortBy(_._1).foreach { case (c, wTo) =>
            if (c != cur) {
              val g = moveGain(i, cur, c, wTo, wCur)
              if (g > bestG + 1e-15 ||
                (math.abs(g - bestG) <= 1e-15 && g > 0 && c < bestC)) {
                bestG = g; bestC = c
              }
            }
          }
          if (bestC != cur && bestG > 0) {
            cdeg(cur) -= deg(i); csize(cur) -= sz(i)
            cdeg(bestC) += deg(i); csize(bestC) += sz(i)
            comm(i) = bestC
            nbrs(i).foreach { case (j, _) =>
              if (comm(j) != bestC && !active(j)) {
                active(j) = true; anyActive = true
              }
            }
          }
        }
        i += 1
      }
      rounds += 1
    }

    // --- refinement: singleton merges within the community, ascending
    // degree order (hit_leiden.rs:399-482); initial subcommunities are
    // all singletons so no CC split is needed on a fresh level
    val sub = (0 until n).toArray // subcomm = own index initially
    val scdeg = deg.clone()
    val scsize = sz.clone()
    val scCount = Array.fill(n)(1) // member count per subcommunity
    def refineGain(i: Int, from: Int, to: Int, wTo: Double,
        wCur: Double): Double =
      if (cfg.useCpm) (wTo - wCur) - gamma * sz(i) * scsize(to)
      else (wTo - wCur) / m2 +
        gamma * deg(i) * (scdeg(from) - deg(i) - scdeg(to)) / (m2 * m2)

    val order = (0 until n).sortBy(i => (deg(i), verts(i)))
    order.foreach { i =>
      if (scCount(sub(i)) == 1) {
        wByComm.clear()
        nbrs(i).foreach { case (j, w) =>
          if (comm(j) == comm(i))
            wByComm.update(sub(j), wByComm.getOrElse(sub(j), 0.0) + w)
        }
        val cur = sub(i)
        val wCur = wByComm.getOrElse(cur, 0.0)
        var bestS = cur
        var bestG = 0.0
        wByComm.toSeq.sortBy(_._1).foreach { case (s, wTo) =>
          if (s != cur) {
            val g = refineGain(i, cur, s, wTo, wCur)
            if (g > bestG + 1e-15 ||
              (math.abs(g - bestG) <= 1e-15 && g > 0 && s < bestS)) {
              bestG = g; bestS = s
            }
          }
        }
        if (bestS != cur && bestG > 0) {
          scdeg(cur) -= deg(i); scsize(cur) -= sz(i); scCount(cur) -= 1
          scdeg(bestS) += deg(i); scsize(bestS) += sz(i); scCount(bestS) += 1
          sub(i) = bestS
        }
      }
    }

    // map dense ids back to stable external labels: min member vertex id
    val commLabel = (0 until n).groupBy(comm(_))
      .map { case (c, is) => c -> is.map(verts(_)).min }
    val subLabel = (0 until n).groupBy(sub(_))
      .map { case (s, is) => s -> is.map(verts(_)).min }
    val commOut = (0 until n).map(i => verts(i) -> commLabel(comm(i))).toMap
    val subOut = (0 until n).map(i => verts(i) -> subLabel(sub(i))).toMap
    (commOut, subOut)
  }
}
