package graft.algo

import scala.collection.mutable

/** Driver-side MAINTAINED upper hierarchy (levels >= 1) — the live
  * form of the reference's per-level incremental pipeline
  * (/root/reference/src/core/algorithm/hit_leiden.rs:85-151: per level
  * inc_movement -> inc_refinement -> inc_aggregation, then def_update
  * composing top-down, hit_leiden.rs:565-599).
  *
  * The engine's level 0 (the base graph) runs distributed
  * ([[Leiden.movement]]/[[Leiden.refinement]] + [[IncAggregation]]);
  * levels >= 1 operate on the supergraph, which by construction fits the
  * driver once it passes `Config.localSolveEdges` — exactly the regime
  * where per-batch DISTRIBUTED re-solves pay a dozen fixed-cost jobs for
  * frontier-sized work. This class keeps every upper level's graph,
  * community mapping (f_p), seat mapping (s_p) and stats as hash maps on
  * the driver and applies each batch as:
  *
  *   - a signed edge-delta merge into the level's adjacency (delta-sized),
  *   - delta activation + frontier-limited movement (immediate updates,
  *     ascending-id rounds — the reference's deterministic inc_movement,
  *     hit_leiden.rs:223-280),
  *   - scoped refinement (CC split of affected subcommunities with
  *     largest-keeps-id + watermark fresh ids, hit_leiden.rs:296-371;
  *     ascending-degree singleton merges, hit_leiden.rs:399-482),
  *   - inc_aggregation emitting the next level's signed delta with the
  *     reference's dedup guard (hit_leiden.rs:487-563),
  *   - top-level connectivity repair scoped to communities a deletion or
  *     a departed member could have disconnected (the delta-scoped form
  *     of [[LocalLeiden.repairConnectivity]]),
  *   - def_update: top-down composition f_p(v) = f_{p+1}(s_p(v)).
  *
  * Per-batch cost is O(frontier + touched-community size) plus O(n_p)
  * label/stat rebuilds per level (n_p = supergraph node count — tens of
  * microseconds per 100k nodes), never O(|E_super|) re-solve work.
  *
  * At 100 TB the same structure holds: level 1+ of a link graph
  * contracts orders of magnitude below the base table, so the upper
  * hierarchy state is a few hundred MB of primitive-keyed maps — driver
  * (or single-executor) resident, exactly like the reference's
  * PartitionState (src/core/partition/state.rs:4-16).
  */
object LocalHier {

  /** One maintained level (level index p >= 1).
    *
    * `adj` holds the symmetric adjacency with a self-loop stored ONCE at
    * key (v -> v); `deg` counts self-loops twice (the engine's
    * convention, see EdgeOps.degrees). `comm` is the composed f_p after
    * def_update; `sub` the current seat mapping s_p into level p+1.
    * `size` = base vertices per node (CPM only; empty in modularity
    * mode). */
  final class Level {
    val adj = mutable.LongMap.empty[mutable.LongMap[Double]]
    val deg = mutable.LongMap.empty[Double]
    val comm = mutable.LongMap.empty[Long]
    val sub = mutable.LongMap.empty[Long]
    val size = mutable.LongMap.empty[Double]
    var edgeCount: Long = 0L

    def nbrs(v: Long): mutable.LongMap[Double] =
      adj.getOrElseUpdate(v, mutable.LongMap.empty[Double])

    def deepCopy: Level = {
      val c = new Level
      adj.foreach { case (v, m) => c.adj(v) = m.clone() }
      c.deg ++= deg; c.comm ++= comm; c.sub ++= sub; c.size ++= size
      c.edgeCount = edgeCount
      c
    }

    /** Ensure `v` exists with community/seat labels (identity default). */
    def ensure(v: Long, c: Long): Unit = {
      if (!comm.contains(v)) comm(v) = c
      if (!sub.contains(v)) sub(v) = v
      if (!deg.contains(v)) deg(v) = 0.0
    }
  }

  final class HState(val levels: mutable.ArrayBuffer[Level], var m2: Double) {
    def level1Edges: Long = if (levels.isEmpty) 0L else levels(0).edgeCount

    /** Structural copy — [[update]] mutates in place, so a caller that
      * keeps the pre-batch State (retry, replay, branching test chains)
      * must hand update a copy to keep State value-semantic. O(E_1)
      * primitive-map cloning: bounded by the local-solve bound, tens of
      * milliseconds — noise against one Spark job. */
    def deepCopy: HState =
      new HState(levels.map(_.deepCopy), m2)
  }

  private val EPS_W = 1e-12

  // ---------------------------------------------------------------------
  // shared primitives
  // ---------------------------------------------------------------------

  /** Apply one signed canonical edge delta to a level; returns the
    * (sorted, distinct) endpoints touched. New nodes take their label
    * from `seedComm` (falling back to identity). */
  private def applyDelta(lvl: Level, delta: Array[(Long, Long, Double)],
      seedComm: Long => Long): Array[Long] = {
    val touched = mutable.LongMap.empty[Unit]
    delta.foreach { case (u, v, dw) =>
      if (dw != 0.0) {
        lvl.ensure(u, seedComm(u)); lvl.ensure(v, seedComm(v))
        touched(u) = (); touched(v) = ()
        if (u == v) {
          val m = lvl.nbrs(u)
          val w0 = m.getOrElse(u, 0.0); val w1 = w0 + dw
          if (math.abs(w1) <= EPS_W) {
            if (m.contains(u)) { m -= u; lvl.edgeCount -= 1 }
          } else { if (w0 == 0.0) lvl.edgeCount += 1; m(u) = w1 }
          lvl.deg(u) = lvl.deg.getOrElse(u, 0.0) + 2.0 * dw
        } else {
          val mu = lvl.nbrs(u); val mv = lvl.nbrs(v)
          val w0 = mu.getOrElse(v, 0.0); val w1 = w0 + dw
          if (math.abs(w1) <= EPS_W) {
            if (mu.contains(v)) { mu -= v; mv -= u; lvl.edgeCount -= 1 }
          } else {
            if (w0 == 0.0) lvl.edgeCount += 1
            mu(v) = w1; mv(u) = w1
          }
          lvl.deg(u) = lvl.deg.getOrElse(u, 0.0) + dw
          lvl.deg(v) = lvl.deg.getOrElse(v, 0.0) + dw
        }
      }
    }
    val out = touched.keysIterator.toArray
    java.util.Arrays.sort(out)
    out
  }

  /** Frontier-limited movement at one level: sequential ascending-id
    * rounds with immediate stat updates (reference deterministic
    * inc_movement). Mutates `lvl.comm`. Returns the moved node set. */
  private def movement(lvl: Level, seed: Iterable[Long], m2: Double,
      cfg: Leiden.Config): mutable.LongMap[Unit] = {
    val moved = mutable.LongMap.empty[Unit]
    if (m2 <= 0.0) return moved
    // community stats rebuilt O(n_p) — labels changed since last batch's
    // movement (composition/repair relabel), so incremental carry is not
    // sound across batches; within the loop they update incrementally
    val cdeg = mutable.LongMap.empty[Double]
    val csize = mutable.LongMap.empty[Double]
    lvl.adj.foreachKey { v =>
      val c = lvl.comm(v)
      cdeg(c) = cdeg.getOrElse(c, 0.0) + lvl.deg(v)
      if (cfg.useCpm)
        csize(c) = csize.getOrElse(c, 0.0) + lvl.size.getOrElse(v, 1.0)
    }
    val gamma = cfg.gamma
    val gainFloor =
      if (cfg.useCpm) cfg.minSweepGain * (m2 / 2.0) else cfg.minSweepGain
    var active = mutable.LongMap.empty[Unit]
    seed.foreach(v => if (lvl.adj.contains(v)) active(v) = ())
    val wBy = mutable.LongMap.empty[Double]
    var rounds = 0
    var roundGain = Double.MaxValue
    while (active.nonEmpty && roundGain >= gainFloor &&
        rounds < cfg.maxSweeps * 4) {
      roundGain = 0.0
      val order = active.keysIterator.toArray
      java.util.Arrays.sort(order)
      val next = mutable.LongMap.empty[Unit]
      var oi = 0
      while (oi < order.length) {
        val v = order(oi)
        val nb = lvl.adj.getOrElse(v, null)
        if (nb != null) {
          wBy.clear()
          nb.foreach { case (n, w) =>
            if (n != v) {
              val c = lvl.comm(n)
              wBy(c) = wBy.getOrElse(c, 0.0) + w
            }
          }
          val cur = lvl.comm(v)
          val wCur = wBy.getOrElse(cur, 0.0)
          val dv = lvl.deg(v)
          val sv = if (cfg.useCpm) lvl.size.getOrElse(v, 1.0) else 1.0
          var bestC = cur
          var bestG = 0.0
          // deterministic candidate order: sorted community ids
          val cands = wBy.keysIterator.toArray
          java.util.Arrays.sort(cands)
          var ci = 0
          while (ci < cands.length) {
            val c = cands(ci)
            if (c != cur) {
              val g =
                if (cfg.useCpm)
                  (wBy(c) - wCur) - gamma * sv *
                    (csize.getOrElse(c, 0.0) - csize.getOrElse(cur, 0.0) + sv)
                else
                  (wBy(c) - wCur) / m2 + gamma * dv *
                    (cdeg.getOrElse(cur, 0.0) - dv -
                      cdeg.getOrElse(c, 0.0)) / (m2 * m2)
              if (g > bestG + 1e-15 ||
                (math.abs(g - bestG) <= 1e-15 && g > 0 && c < bestC)) {
                bestG = g; bestC = c
              }
            }
            ci += 1
          }
          if (bestC != cur && bestG > 0) {
            roundGain += bestG
            cdeg(cur) = cdeg.getOrElse(cur, 0.0) - dv
            cdeg(bestC) = cdeg.getOrElse(bestC, 0.0) + dv
            if (cfg.useCpm) {
              csize(cur) = csize.getOrElse(cur, 0.0) - sv
              csize(bestC) = csize.getOrElse(bestC, 0.0) + sv
            }
            lvl.comm(v) = bestC
            moved(v) = ()
            nb.foreachKey { n =>
              if (n != v && lvl.comm(n) != bestC) next(n) = ()
            }
          }
        }
        oi += 1
      }
      active = next
      rounds += 1
    }
    moved
  }

  /** Refinement at one level: CC split of affected subcommunities
    * (largest fragment keeps the id, ties to the smallest fragment-min;
    * fresh ids allocated ascending above `freshIdBase`) + ascending-
    * degree singleton merges of refined nodes within their community.
    * Mutates `lvl.sub`. Returns (refined nodes -> previous seat,
    * freshUsed). */
  private def refinement(lvl: Level, affected: Iterable[Long], m2: Double,
      cfg: Leiden.Config, freshIdBase: Long)
      : (mutable.LongMap[Long], Long) = {
    val preSeat = mutable.LongMap.empty[Long] // refined -> previous seat
    var freshUsed = 0L
    val affScs = mutable.LongMap.empty[Unit]
    affected.foreach { v =>
      lvl.sub.get(v).foreach(sc => affScs(sc) = ())
    }
    if (affScs.nonEmpty) {
      // member lists for affected subcommunities: one O(n_p) pass
      // (reference hit_leiden.rs:303-310)
      val members = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
      lvl.adj.foreachKey { v =>
        val sc = lvl.sub(v)
        if (affScs.contains(sc))
          members.getOrElseUpdate(sc, mutable.ArrayBuffer.empty) += v
      }
      // deterministic subcommunity order
      val scOrder = members.keysIterator.toArray
      java.util.Arrays.sort(scOrder)
      val visited = mutable.LongMap.empty[Unit]
      val freshFrags = mutable.ArrayBuffer.empty[(Long, Long, Array[Long])]
      scOrder.foreach { sc =>
        val vs = members(sc).toArray
        java.util.Arrays.sort(vs)
        val comps = mutable.ArrayBuffer.empty[Array[Long]]
        vs.foreach { start =>
          if (!visited.contains(start)) {
            val comp = mutable.ArrayBuffer.empty[Long]
            val queue = mutable.ArrayDeque(start)
            visited(start) = ()
            while (queue.nonEmpty) {
              val cur = queue.removeHead()
              comp += cur
              lvl.adj.getOrElse(cur, mutable.LongMap.empty[Double])
                .foreachKey { n =>
                  if (n != cur && lvl.sub.get(n).contains(sc) &&
                      !visited.contains(n)) {
                    visited(n) = (); queue += n
                  }
                }
            }
            comps += comp.toArray
          }
        }
        if (comps.length > 1) {
          // largest keeps the id; ties to the smallest min-member
          // (matches the distributed wKeep window: desc(n), asc(comp))
          comps.foreach(c => java.util.Arrays.sort(c))
          val keeper = comps.maxBy(c => (c.length.toLong, -c.head))
          comps.foreach { c =>
            if (c ne keeper) freshFrags += ((sc, c.head, c))
          }
        }
      }
      // fresh ids ascending in (subcomm, fragment-min) order — identical
      // to the distributed wFresh global window
      val sortedFrags = freshFrags.sortBy(f => (f._1, f._2))
      sortedFrags.zipWithIndex.foreach { case ((sc, _, vs), i) =>
        val fresh = freshIdBase + i + 1
        vs.foreach { v =>
          preSeat.getOrElseUpdate(v, lvl.sub(v))
          lvl.sub(v) = fresh
        }
      }
      freshUsed = sortedFrags.length.toLong
    }

    // phase 2: singleton merges of refined nodes, ascending (degree, id)
    val refinedNow = preSeat.keysIterator.toArray
    if (refinedNow.nonEmpty) {
      // subcommunity stats over the touched COMMUNITIES only (delta-
      // bound, mirrors the distributed affComms scope)
      val affComms = mutable.LongMap.empty[Unit]
      refinedNow.foreach(v => affComms(lvl.comm(v)) = ())
      val scdeg = mutable.LongMap.empty[Double]
      val scn = mutable.LongMap.empty[Long]
      val scbase = mutable.LongMap.empty[Double]
      lvl.adj.foreachKey { v =>
        if (affComms.contains(lvl.comm(v))) {
          val sc = lvl.sub(v)
          scdeg(sc) = scdeg.getOrElse(sc, 0.0) + lvl.deg(v)
          scn(sc) = scn.getOrElse(sc, 0L) + 1L
          if (cfg.useCpm)
            scbase(sc) = scbase.getOrElse(sc, 0.0) +
              lvl.size.getOrElse(v, 1.0)
        }
      }
      val order = refinedNow.sortBy(v => (lvl.deg(v), v))
      val gamma = cfg.gamma
      val wBy = mutable.LongMap.empty[Double]
      order.foreach { v =>
        val mySc = lvl.sub(v)
        if (scn.getOrElse(mySc, 0L) == 1L) {
          wBy.clear()
          val myComm = lvl.comm(v)
          lvl.adj(v).foreach { case (n, w) =>
            if (n != v && lvl.comm.get(n).contains(myComm)) {
              val sc = lvl.sub(n)
              wBy(sc) = wBy.getOrElse(sc, 0.0) + w
            }
          }
          val wCur = wBy.getOrElse(mySc, 0.0)
          val dv = lvl.deg(v)
          val sv = if (cfg.useCpm) lvl.size.getOrElse(v, 1.0) else 1.0
          var bestS = mySc
          var bestG = 0.0
          val cands = wBy.keysIterator.toArray
          java.util.Arrays.sort(cands)
          var ci = 0
          while (ci < cands.length) {
            val s = cands(ci)
            if (s != mySc) {
              val g =
                if (cfg.useCpm)
                  (wBy(s) - wCur) - gamma * sv * scbase.getOrElse(s, 0.0)
                else
                  (wBy(s) - wCur) / m2 + gamma * dv *
                    (scdeg.getOrElse(mySc, 0.0) - dv -
                      scdeg.getOrElse(s, 0.0)) / (m2 * m2)
              if (g > bestG + 1e-15 ||
                (math.abs(g - bestG) <= 1e-15 && g > 0 && s < bestS)) {
                bestG = g; bestS = s
              }
            }
            ci += 1
          }
          if (bestS != mySc && bestG > 0) {
            preSeat.getOrElseUpdate(v, mySc)
            lvl.sub(v) = bestS
            scdeg(mySc) = scdeg.getOrElse(mySc, 0.0) - dv
            scdeg(bestS) = scdeg.getOrElse(bestS, 0.0) + dv
            scn(mySc) = scn.getOrElse(mySc, 0L) - 1L
            scn(bestS) = scn.getOrElse(bestS, 0L) + 1L
            if (cfg.useCpm) {
              scbase(mySc) = scbase.getOrElse(mySc, 0.0) - sv
              scbase(bestS) = scbase.getOrElse(bestS, 0.0) + sv
            }
          }
        }
      }
      // a merge may have emptied a refined node's old singleton seat and
      // re-seated it back onto its pre-batch seat: drop no-op entries so
      // R matches the reference contract (seat actually changed)
      val noop = preSeat.iterator
        .filter { case (v, pre) => lvl.sub(v) == pre }.map(_._1).toArray
      noop.foreach(preSeat -= _)
    }
    (preSeat, freshUsed)
  }

  /** inc_aggregation: the next level's signed edge delta from this
    * level's delta + refinement re-seatings, with the reference's dedup
    * guard (`cur(n)==pre(n) || v < n`, hit_leiden.rs:509-511), plus the
    * node-size delta (CPM) and fresh-seat community seeds. */
  private def aggregation(lvl: Level, delta: Array[(Long, Long, Double)],
      preSeat: mutable.LongMap[Long], cfg: Leiden.Config)
      : (Array[(Long, Long, Double)], mutable.LongMap[Long],
        mutable.LongMap[Double]) = {
    def pre(x: Long): Long = preSeat.getOrElse(x, lvl.sub(x))
    def cur(x: Long): Long = lvl.sub(x)
    val acc = mutable.HashMap.empty[(Long, Long), Double]
    def add(a: Long, b: Long, w: Double): Unit = {
      val k = if (a <= b) (a, b) else (b, a)
      val w1 = acc.getOrElse(k, 0.0) + w
      if (math.abs(w1) <= EPS_W) acc -= k else acc(k) = w1
    }
    // 1. delta edges through the PREVIOUS mapping (hit_leiden.rs:499-504)
    delta.foreach { case (u, v, dw) => if (dw != 0.0) add(pre(u), pre(v), dw) }
    // 2. refined nodes re-seat their incident edges (hit_leiden.rs:507-525)
    val rOrder = preSeat.keysIterator.toArray
    java.util.Arrays.sort(rOrder)
    val newSeatComm = mutable.LongMap.empty[Long]
    val sizeDelta = mutable.LongMap.empty[Double]
    rOrder.foreach { v =>
      val pv = preSeat(v); val cv = cur(v)
      newSeatComm.getOrElseUpdate(cv, lvl.comm(v))
      if (cfg.useCpm) {
        val sv = lvl.size.getOrElse(v, 1.0)
        sizeDelta(pv) = sizeDelta.getOrElse(pv, 0.0) - sv
        sizeDelta(cv) = sizeDelta.getOrElse(cv, 0.0) + sv
      }
      lvl.adj.getOrElse(v, mutable.LongMap.empty[Double]).foreach {
        case (n, w) =>
          if (n == v) { // self-loop re-seats exactly once
            add(pv, pv, -w); add(cv, cv, w)
          } else if (!preSeat.contains(n) || v < n) { // dedup guard
            add(pv, pre(n), -w); add(cv, cur(n), w)
          }
      }
    }
    val out = acc.iterator.map { case ((a, b), w) => (a, b, w) }.toArray
      .sortBy(e => (e._1, e._2))
    (out, newSeatComm, sizeDelta)
  }

  /** Delta-scoped connectivity repair at the TOP level: a community can
    * only have been disconnected by a deletion inside it or by losing a
    * member to movement, so only those communities are BFS-split
    * (fragments relabel to their min member — the
    * [[LocalLeiden.repairConnectivity]] policy). Internal connectivity
    * of every node is maintained inductively by each level's refinement
    * CC split, so community connectivity is fully decidable at the top.
    * Returns the relabeled nodes (movement re-activation seeds). */
  private def repairTop(lvl: Level, suspectComms: Iterable[Long])
      : mutable.ArrayBuffer[Long] = {
    val relabeled = mutable.ArrayBuffer.empty[Long]
    val suspects = mutable.LongMap.empty[Unit]
    suspectComms.foreach(c => suspects(c) = ())
    if (suspects.isEmpty) return relabeled
    // members of suspect communities: one O(n_top) pass
    val members = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    lvl.adj.foreachKey { v =>
      val c = lvl.comm(v)
      if (suspects.contains(c))
        members.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += v
    }
    val commOrder = members.keysIterator.toArray
    java.util.Arrays.sort(commOrder)
    val visited = mutable.LongMap.empty[Unit]
    commOrder.foreach { c =>
      val vs = members(c).toArray
      java.util.Arrays.sort(vs)
      val comps = mutable.ArrayBuffer.empty[Array[Long]]
      vs.foreach { start =>
        if (!visited.contains(start)) {
          val comp = mutable.ArrayBuffer.empty[Long]
          val queue = mutable.ArrayDeque(start)
          visited(start) = ()
          while (queue.nonEmpty) {
            val cur = queue.removeHead()
            comp += cur
            lvl.adj.getOrElse(cur, mutable.LongMap.empty[Double])
              .foreachKey { n =>
                if (n != cur && lvl.comm.get(n).contains(c) &&
                    !visited.contains(n)) {
                  visited(n) = (); queue += n
                }
              }
          }
          comps += comp.toArray
        }
      }
      if (comps.length > 1) {
        comps.foreach { comp =>
          var min = Long.MaxValue
          comp.foreach(v => if (v < min) min = v)
          comp.foreach { v =>
            if (lvl.comm(v) != min) { lvl.comm(v) = min; relabeled += v }
          }
        }
      }
    }
    relabeled
  }

  /** def_update: compose f_p(v) = f_{p+1}(s_p(v)) top-down over all
    * maintained nodes (O(Σ n_p) hash lookups — equivalent to the
    * reference's changed-set form because unchanged chains compose to
    * their current label). A node whose seat has no upper label keeps
    * its own (isolated supernode semantics). */
  private def compose(h: HState): Unit = {
    var p = h.levels.length - 2
    while (p >= 0) {
      val lvl = h.levels(p)
      val up = h.levels(p + 1)
      lvl.adj.foreachKey { v =>
        up.comm.get(lvl.sub(v)).foreach(lvl.comm(v) = _)
      }
      p -= 1
    }
  }

  // ---------------------------------------------------------------------
  // public API
  // ---------------------------------------------------------------------

  /** Build the hierarchy from the (local-solve-sized) level-1 supergraph:
    * the cold counterpart of [[update]] — same movement/refinement code
    * with everyone active, then a full contraction per level, until the
    * graph stops shrinking or `cfg.maxLevels` is hit. `carried` seeds
    * level-1 communities (connectivity-repaired by the caller). Returns
    * the hierarchy and the composed level-1 assignment. */
  def init(eSrc: Array[Long], eDst: Array[Long], eW: Array[Double],
      carried: Map[Long, Long], sizes: Map[Long, Long],
      cfg: Leiden.Config): (HState, Map[Long, Long]) = {
    var m2 = 0.0
    eW.foreach(m2 += 2.0 * _)
    val h = new HState(mutable.ArrayBuffer.empty, m2)

    // level 1 from the canonical arrays
    val l1 = new Level
    var i = 0
    while (i < eSrc.length) {
      val u = eSrc(i); val v = eDst(i); val w = eW(i)
      l1.ensure(u, carried.getOrElse(u, u))
      l1.ensure(v, carried.getOrElse(v, v))
      if (u == v) { l1.nbrs(u)(u) = w; l1.deg(u) += 2.0 * w }
      else {
        l1.nbrs(u)(v) = w; l1.nbrs(v)(u) = w
        l1.deg(u) += w; l1.deg(v) += w
      }
      l1.edgeCount += 1
      i += 1
    }
    if (cfg.useCpm)
      sizes.foreach { case (v, s) =>
        if (l1.adj.contains(v)) l1.size(v) = s.toDouble
      }
    h.levels += l1

    // cold per-level loop: movement (all active) + initial refinement
    // (identity seats -> all refined, merges only) + full contraction
    var lvl = l1
    var done = false
    while (!done && h.levels.length < math.max(cfg.maxLevels, 1)) {
      val all = lvl.adj.keysIterator.toArray
      java.util.Arrays.sort(all)
      movement(lvl, all, h.m2, cfg)
      // initial refinement: identity seats are singletons (no split
      // possible), everyone refined (hit_leiden.rs:373-379)
      refinementInitial(lvl, h.m2, cfg)
      val next = contract(lvl, cfg)
      if (next == null) done = true
      else { h.levels += next; lvl = next }
    }
    compose(h)
    (h, composedLevel1(h))
  }

  /** Initial-phase refinement: everyone refined, merges only (mirrors
    * [[refinement]] phase 2 with refined = all nodes). */
  private def refinementInitial(lvl: Level, m2: Double,
      cfg: Leiden.Config): Unit = {
    val scdeg = mutable.LongMap.empty[Double]
    val scn = mutable.LongMap.empty[Long]
    val scbase = mutable.LongMap.empty[Double]
    lvl.adj.foreachKey { v =>
      val sc = lvl.sub(v)
      scdeg(sc) = scdeg.getOrElse(sc, 0.0) + lvl.deg(v)
      scn(sc) = scn.getOrElse(sc, 0L) + 1L
      if (cfg.useCpm)
        scbase(sc) = scbase.getOrElse(sc, 0.0) + lvl.size.getOrElse(v, 1.0)
    }
    val order = lvl.adj.keysIterator.toArray
      .sortBy(v => (lvl.deg(v), v))
    val gamma = cfg.gamma
    val wBy = mutable.LongMap.empty[Double]
    order.foreach { v =>
      val mySc = lvl.sub(v)
      if (scn.getOrElse(mySc, 0L) == 1L) {
        wBy.clear()
        val myComm = lvl.comm(v)
        lvl.adj(v).foreach { case (n, w) =>
          if (n != v && lvl.comm.get(n).contains(myComm)) {
            val sc = lvl.sub(n)
            wBy(sc) = wBy.getOrElse(sc, 0.0) + w
          }
        }
        val wCur = wBy.getOrElse(mySc, 0.0)
        val dv = lvl.deg(v)
        val sv = if (cfg.useCpm) lvl.size.getOrElse(v, 1.0) else 1.0
        var bestS = mySc
        var bestG = 0.0
        val cands = wBy.keysIterator.toArray
        java.util.Arrays.sort(cands)
        var ci = 0
        while (ci < cands.length) {
          val s = cands(ci)
          if (s != mySc) {
            val g =
              if (cfg.useCpm)
                (wBy(s) - wCur) - gamma * sv * scbase.getOrElse(s, 0.0)
              else
                (wBy(s) - wCur) / m2 + gamma * dv *
                  (scdeg.getOrElse(mySc, 0.0) - dv -
                    scdeg.getOrElse(s, 0.0)) / (m2 * m2)
            if (g > bestG + 1e-15 ||
              (math.abs(g - bestG) <= 1e-15 && g > 0 && s < bestS)) {
              bestG = g; bestS = s
            }
          }
          ci += 1
        }
        if (bestS != mySc && bestG > 0) {
          lvl.sub(v) = bestS
          scdeg(mySc) = scdeg.getOrElse(mySc, 0.0) - dv
          scdeg(bestS) = scdeg.getOrElse(bestS, 0.0) + dv
          scn(mySc) = scn.getOrElse(mySc, 0L) - 1L
          scn(bestS) = scn.getOrElse(bestS, 0L) + 1L
          if (cfg.useCpm) {
            scbase(mySc) = scbase.getOrElse(mySc, 0.0) - sv
            scbase(bestS) = scbase.getOrElse(bestS, 0.0) + sv
          }
        }
      }
    }
  }

  /** Full contraction by current seats (init only). Returns null when
    * the graph stops shrinking (every node its own seat). */
  private def contract(lvl: Level, cfg: Leiden.Config): Level = {
    var shrank = false
    lvl.adj.foreachKey { v => if (lvl.sub(v) != v) shrank = true }
    if (!shrank) return null
    val next = new Level
    lvl.adj.foreachKey { v =>
      val s = lvl.sub(v)
      next.ensure(s, lvl.comm(v)) // members share one community
      if (cfg.useCpm)
        next.size(s) = next.size.getOrElse(s, 0.0) +
          lvl.size.getOrElse(v, 1.0)
    }
    // contracted edges: iterate each undirected edge once (u <= n)
    lvl.adj.foreach { case (u, nb) =>
      nb.foreach { case (n, w) =>
        if (u <= n) {
          val a = lvl.sub(u); val b = lvl.sub(n)
          val (x, y) = if (a <= b) (a, b) else (b, a)
          val m = next.nbrs(x)
          val w0 = m.getOrElse(y, 0.0)
          if (w0 == 0.0) next.edgeCount += 1
          m(y) = w0 + w
          if (x != y) next.nbrs(y)(x) = w0 + w
          if (x == y) next.deg(x) = next.deg.getOrElse(x, 0.0) + 2.0 * w
          else {
            next.deg(x) = next.deg.getOrElse(x, 0.0) + w
            next.deg(y) = next.deg.getOrElse(y, 0.0) + w
          }
        }
      }
    }
    next
  }

  /** Apply one batch: per-level delta pipeline + top repair + composition
    * (the live def_update). `delta1` is the level-1 signed canonical
    * delta (the collected deltaH); `seedComm1` supplies community labels
    * for level-1 nodes this batch introduces (fresh split seats / new
    * singletons — their community in the post-movement base assignment).
    * Fresh seat ids are allocated above `freshIdBase`; returns the count
    * consumed.
    *
    * When `cfg.hierRebuildUpper` holds (and level 1 is under the polish
    * bound), level 1 runs the delta pipeline (movement, scoped repair,
    * scoped refinement) and the levels ABOVE it are rebuilt from the
    * maintained level-1 seats — an O(E_1) in-memory pass. The reference
    * maintains a FIXED level count and lets the upper grouping go stale
    * (hit_leiden.rs:95-137: supergraphs updated in place, never
    * re-grouped); rebuilding the tiny upper levels each batch recovers
    * the quality a from-scratch solve finds, at driver-CPU cost that is
    * noise next to one Spark job. */
  def update(h: HState, delta1: Array[(Long, Long, Double)],
      seedComm1: Map[Long, Long], cfg: Leiden.Config,
      freshIdBase: Long): Long = {
    if (cfg.hierRebuildUpper && cfg.hierPolishEdges > 0 &&
        h.levels.nonEmpty &&
        h.levels.head.edgeCount + delta1.length <= cfg.hierPolishEdges)
      return updateRebuild(h, delta1, seedComm1, cfg, freshIdBase)
    updateDelta(h, delta1, seedComm1, cfg, freshIdBase)
  }

  /** Level-1 delta pipeline + from-seats rebuild of all upper levels. */
  private def updateRebuild(h: HState, delta1: Array[(Long, Long, Double)],
      seedComm1: Map[Long, Long], cfg: Leiden.Config,
      freshIdBase: Long): Long = {
    var dW = 0.0
    delta1.foreach(dW += _._3)
    h.m2 += 2.0 * dW
    val lvl = h.levels.head
    val seedComm: Long => Long = v => seedComm1.getOrElse(v, v)
    // deletions inside a community can disconnect it — note suspects
    // BEFORE labels move
    val suspect = mutable.LongMap.empty[Unit]
    delta1.foreach { case (u, v, dw) =>
      if (dw < 0.0) {
        lvl.comm.get(u).foreach(c => suspect(c) = ())
        lvl.comm.get(v).foreach(c => suspect(c) = ())
      }
    }
    applyDelta(lvl, delta1, seedComm)
    val active = mutable.LongMap.empty[Unit]
    delta1.foreach { case (u, v, dw) =>
      if (u != v) {
        val cu = lvl.comm(u); val cv = lvl.comm(v)
        if ((dw > 0.0 && cu != cv) || (dw < 0.0 && cu == cv)) {
          active(u) = (); active(v) = ()
        }
      } else if (dw < 0.0) active(u) = ()
    }
    val seedNodes: Iterable[Long] =
      if (lvl.edgeCount <= cfg.hierPolishEdges)
        lvl.adj.keysIterator.toSeq
      else active.keysIterator.toSeq
    val moved = movement(lvl, seedNodes, h.m2, cfg)
    moved.foreachKey { v => suspect(lvl.comm(v)) = () }
    val relab = repairTop(lvl, suspect.keysIterator.toSeq)
    if (relab.nonEmpty) movement(lvl, relab, h.m2, cfg)
    // fresh seats: identity + the full ascending-(degree,id) merge pass —
    // seat formation is where the from-scratch solve earns its quality
    // (measured: re-using maintained seats leaves ~0.0016 modularity on
    // the table; fresh seats land within 1e-4 of the solve, sometimes
    // above it). Seat ids are node ids, so no fresh-id watermark draw.
    lvl.sub.clear()
    lvl.adj.foreachKey(v => lvl.sub(v) = v)
    refinementInitial(lvl, h.m2, cfg)
    val freshUsed = 0L
    // rebuild levels >= 2 from the fresh level-1 seats
    while (h.levels.length > 1) h.levels.remove(h.levels.length - 1)
    var cur = lvl
    var done = false
    while (!done && h.levels.length < math.max(cfg.maxLevels, 1)) {
      val next = contract(cur, cfg)
      if (next == null) done = true
      else {
        h.levels += next
        val all = next.adj.keysIterator.toArray
        java.util.Arrays.sort(all)
        movement(next, all, h.m2, cfg)
        refinementInitial(next, h.m2, cfg)
        cur = next
      }
    }
    compose(h)
    freshUsed
  }

  /** The reference-faithful per-level delta pipeline (fixed maintained
    * levels, hit_leiden.rs:104-136). */
  private def updateDelta(h: HState, delta1: Array[(Long, Long, Double)],
      seedComm1: Map[Long, Long], cfg: Leiden.Config,
      freshIdBase: Long): Long = {
    var dW = 0.0
    delta1.foreach(dW += _._3)
    h.m2 += 2.0 * dW
    var freshUsed = 0L
    var delta = delta1
    var seedComm: Long => Long = v => seedComm1.getOrElse(v, v)
    var sizeDelta: mutable.LongMap[Double] = null
    var p = 0
    while (p < h.levels.length && delta.nonEmpty) {
      val lvl = h.levels(p)
      val isTop = p == h.levels.length - 1
      // deletions inside a community can disconnect it — note the
      // suspect communities BEFORE labels move
      val suspect = mutable.LongMap.empty[Unit]
      if (isTop) delta.foreach { case (u, v, dw) =>
        if (dw < 0.0) {
          lvl.comm.get(u).foreach(c => suspect(c) = ())
          lvl.comm.get(v).foreach(c => suspect(c) = ())
        }
      }
      val touched = applyDelta(lvl, delta, seedComm)
      if (cfg.useCpm && sizeDelta != null)
        sizeDelta.foreach { case (v, ds) =>
          lvl.size(v) = lvl.size.getOrElse(v, 0.0) + ds
        }
      // delta activation (hit_leiden.rs:166-186) + refinement K seed
      val active = mutable.LongMap.empty[Unit]
      val kSeed = mutable.LongMap.empty[Unit]
      delta.foreach { case (u, v, dw) =>
        if (u != v) {
          val cu = lvl.comm(u); val cv = lvl.comm(v)
          if ((dw > 0.0 && cu != cv) || (dw < 0.0 && cu == cv)) {
            active(u) = (); active(v) = ()
          }
          if (lvl.sub(u) == lvl.sub(v)) { kSeed(u) = (); kSeed(v) = () }
        } else if (dw < 0.0) { active(u) = (); kSeed(u) = () }
      }
      // polish: at in-memory scale a FULL deterministic pass is O(E_p)
      // (milliseconds) and picks up the far-from-delta epsilon drift the
      // frontier misses — the quality-band insurance the re-solve path
      // got for free. Frontier-only above the bound.
      val seedNodes: Iterable[Long] =
        if (cfg.hierPolishEdges > 0 && lvl.edgeCount <= cfg.hierPolishEdges)
          lvl.adj.keysIterator.toSeq
        else active.keysIterator.toSeq
      val moved = movement(lvl, seedNodes, h.m2, cfg)
      if (isTop) {
        // movement can also strand a community that lost a member
        moved.foreachKey { v => suspect(lvl.comm(v)) = () }
        val relab = repairTop(lvl, suspect.keysIterator.toSeq)
        if (relab.nonEmpty) {
          // split fragments may want to re-merge or move — one more
          // frontier pass over exactly the relabeled nodes
          val m2pass = movement(lvl, relab, h.m2, cfg)
          m2pass.foreachKey(v => kSeed(v) = ())
        }
      }
      moved.foreachKey(v => kSeed(v) = ())
      touched.foreach { v =>
        // new nodes enter as their own singleton seat: candidates for
        // phase-2 merges exactly like level-0 new vertices
        if (!lvl.sub.contains(v)) lvl.sub(v) = v
      }
      val (preSeat, fu) = refinement(lvl, kSeed.keysIterator.toSeq, h.m2,
        cfg, freshIdBase + freshUsed)
      freshUsed += fu
      if (!isTop) {
        val (nextDelta, newSeatComm, sd) = aggregation(lvl, delta, preSeat,
          cfg)
        delta = nextDelta
        sizeDelta = sd
        val up = h.levels(p + 1)
        seedComm = v => newSeatComm.getOrElse(v,
          up.comm.getOrElse(v, lvl.comm.getOrElse(v, v)))
      } else delta = Array.empty
      p += 1
    }
    compose(h)
    freshUsed
  }

  /** The composed level-1 assignment: subcommunity -> community. */
  def composedLevel1(h: HState): Map[Long, Long] = {
    val l1 = h.levels.head
    val out = Map.newBuilder[Long, Long]
    l1.adj.foreachKey { v => out += v -> l1.comm(v) }
    out.result()
  }
}
