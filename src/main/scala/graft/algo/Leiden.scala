package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps
import graft.run.{IterMetric, MetricsSink}

/** Leiden community detection, Spark-native.
  *
  * Re-expresses the reference's HIT-Leiden engine
  * (/root/reference/src/core/algorithm/hit_leiden.rs) in its *throughput
  * mode* semantics (/root/reference/src/core/algorithm/throughput.rs:62-166):
  * every superstep evaluates all active vertices against a stale snapshot
  * of assignments/degrees and applies the moves at a barrier. That is
  * exactly Spark's BSP execution model — the rayon barrier becomes the
  * shuffle, the per-thread accumulation buffers become Catalyst hash
  * aggregation, and the atomic frontier bitsets become frontier DataFrames.
  *
  * Phases per level (paper Algorithm 6, reference hit_leiden.rs:85-151):
  *   1. movement   — modularity-ascent local moves over an active frontier
  *                   (gain formula from hit_leiden.rs:250-255);
  *   2. refinement — split disconnected subcommunities (BFS -> distributed
  *                   hash-min CC, hit_leiden.rs:296-371) then merge
  *                   singleton subcommunities within their community by the
  *                   same gain (hit_leiden.rs:417-482, throughput variant
  *                   throughput.rs:168-259);
  *   3. aggregation — contract subcommunities into supervertices
  *                   (group-sum; the reference's delta-form lives in
  *                   [[graft.algo.Incremental]]).
  *
  * Documented divergences from the reference (all within its own
  * throughput-mode equivalence policy of quality delta <= 0.001,
  * /root/reference/src/core/validation/equivalence.rs:21-27):
  *   - subcommunity ids: every CC-split component takes its minimum member
  *     vertex id instead of "largest keeps old id + counter for the rest"
  *     (hit_leiden.rs:352-370). With non-dense 64-bit hashed vertex ids a
  *     max+1 counter cannot be allocated distributively without collisions;
  *     min-member ids are deterministic, collision-free (a vertex has one
  *     subcommunity), and stable for unchanged components.
  *   - singleton merges run as BSP rounds to a fixpoint instead of one
  *     stale pass; a merge into another *singleton* is only allowed toward
  *     the smaller subcommunity id, which breaks A<->B swap cycles that the
  *     reference's stale pass can produce, and guarantees progress.
  *   - movement supersteps are capped (cfg.maxSweeps); the reference's
  *     `while any active` loop (hit_leiden.rs:202) has no cap and can
  *     oscillate under stale snapshots.
  *   - movement applies only a deterministic hash-parity half of the
  *     positive-gain moves per superstep (gated movers stay in the
  *     frontier). Under stale snapshots two adjacent vertices can
  *     otherwise swap communities forever (e.g. a single edge between two
  *     singletons never merges); gating breaks the symmetry while staying
  *     deterministic and parallelism-independent.
  */
object Leiden {

  final case class Config(
      gamma: Double = 1.0,
      maxLevels: Int = 10,
      maxSweeps: Int = 40,
      maxRefineRounds: Int = 5,
      eps: Double = 1e-9,
      /** adjacency partition count; 0 = the session's shuffle partitions */
      numPartitions: Int = 0,
      /** quality function: false = modularity (reference gain,
        * hit_leiden.rs:250-255), true = CPM (paper Def. 1) — the gain uses
        * community sizes (in base vertices) instead of degrees */
      useCpm: Boolean = false,
      /** explicit hot-key salting for the gather join: vertices whose
        * degree exceeds hotDegree are joined via saltFactor sub-keys
        * (two-stage aggregation). 0/1 = off; AQE skew-join handles
        * sort-merge skew, but the gather is a shuffled-hash join, which
        * AQE does not split. */
      saltFactor: Int = 0,
      hotDegree: Double = 1e6)

  private[algo] def parts(df: DataFrame, cfg: Config): Int =
    if (cfg.numPartitions > 0) cfg.numPartitions
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** @param assignment (v LONG, community LONG) for every input vertex
    * @param modularity final quality at gamma: modularity, or CPM when
    *   cfg.useCpm (real scoring — the reference emits a placeholder 1.0,
    *   hit_leiden.rs:69-75)
    */
  final case class Result(
      assignment: DataFrame,
      levels: Int,
      modularity: Double,
      communityCount: Long,
      sweepsPerLevel: Seq[Int])

  // ---------------------------------------------------------------------
  // cold start: full Leiden on an edge table
  // ---------------------------------------------------------------------

  /** @param initial optional warm-start partition (v, community); absent
    *   means all-singleton (the reference's identity state). Vertices not
    *   covered default to their own community. */
  def run(edges: DataFrame, cfg: Config = Config(),
      sink: MetricsSink = MetricsSink.discard,
      initial: Option[DataFrame] = None): Result = {

    val canon0 = EdgeOps.compress(edges, cfg.eps).ckpt
    val m = EdgeOps.totalWeight(canon0)
    val m2 = 2.0 * m
    if (m2 == 0.0) {
      val empty = EdgeOps.vertices(canon0).withColumn("community", col("v"))
      return Result(empty, 0, 0.0, empty.count(), Nil)
    }

    var canon = canon0
    // per-level subcommunity mapping (v_level -> subcomm = v_{level+1})
    var mappings = Vector.empty[DataFrame]
    // (v, community) carried into the current level; at level 0 this is
    // the caller's warm-start partition if any
    var carriedComm: Option[DataFrame] =
      initial.map(_.select(col("v"), col("community")).ckpt)
    // (v, size) node sizes in base vertices, None = all ones (level 0)
    var carriedSize: Option[DataFrame] = None
    var topAssign: DataFrame = null
    var sweeps = Vector.empty[Int]
    var level = 0
    var done = false

    while (!done && level < cfg.maxLevels) {
      val adj = EdgeOps.partitionBySrc(EdgeOps.symmetrize(canon),
        parts(canon, cfg)).ckpt
      val deg = EdgeOps.degrees(adj).ckpt
      val verts = EdgeOps.vertices(canon).ckpt
      val nVerts = verts.count()

      // initial partition: carried communities (level>0) or singletons;
      // subcommunities always restart as singletons (state.rs:19-33)
      val init = carriedComm match {
        case Some(cc) => verts.join(cc, Seq("v"), "left")
          .select(col("v"), coalesce(col("community"), col("v")).as("community"),
            col("v").as("subcomm"))
        case None => verts.select(col("v"), col("v").as("community"),
          col("v").as("subcomm"))
      }

      // 1. movement — cold start activates every vertex (hit_leiden.rs:183-186)
      val mv = movement(adj, deg, m2, init.ckpt, verts, cfg, sink, level,
        carriedSize)
      sweeps :+= mv.sweeps

      // 2. refinement — initial run refines everyone (hit_leiden.rs:373-379)
      val ref = refinement(adj, deg, m2, mv.assign, verts, cfg, sink, level,
        isInitial = true, nodeSize = carriedSize)
      val assign = ref.assign.ckpt

      // 3. aggregation: contract subcommunities (pure group-sum; the
      //    reference's compress, hit_leiden.rs:533-546)
      val scOfSrc = assign.select(col("v").as("src"), col("subcomm").as("scu"))
      val scOfDst = assign.select(col("v").as("dst"), col("subcomm").as("scv"))
      val superCanon = canon.join(scOfSrc, "src").join(scOfDst, "dst")
        .select(least(col("scu"), col("scv")).as("src"),
          greatest(col("scu"), col("scv")).as("dst"), col("weight"))
        .groupBy("src", "dst").agg(sum("weight").as("weight"))
        .where(abs(col("weight")) > cfg.eps)
        .ckpt
      val nSuper = assign.select("subcomm").distinct().count()

      topAssign = assign
      if (nSuper == nVerts || level == cfg.maxLevels - 1) {
        done = true
      } else {
        mappings :+= assign.select(col("v"), col("subcomm"))
        // supergraph initial communities = community of the subcommunity
        carriedComm = Some(assign.groupBy(col("subcomm").as("v"))
          .agg(min(col("community")).as("community")).ckpt)
        // supernode size = total base vertices it contains (CPM gain)
        val szCur = carriedSize.getOrElse(
          assign.select(col("v"), lit(1L).as("size")))
        carriedSize = Some(assign.select(col("v"), col("subcomm"))
          .join(szCur, "v")
          .groupBy(col("subcomm").as("v")).agg(sum("size").as("size"))
          .ckpt)
        canon = superCanon
        level += 1
      }
    }

    // compose s_0 .. s_{L-1} then the top level's community — the batch
    // form of def_update (hit_leiden.rs:565-599): f_p(v) = f_{p+1}(s_p(v))
    var composed = mappings.headOption match {
      case None => topAssign.select(col("v"), col("v").as("cur"))
      case Some(m0) => m0.select(col("v"), col("subcomm").as("cur"))
    }
    for (p <- 1 until mappings.length) {
      val mp = mappings(p).select(col("v").as("cur"), col("subcomm").as("next"))
      composed = composed.join(mp, "cur").select(col("v"), col("next").as("cur"))
    }
    val finalAssign = composed
      .join(topAssign.select(col("v").as("cur"), col("community")), "cur")
      .select(col("v"), col("community"))
      .ckpt

    val q =
      if (cfg.useCpm) Quality.cpm(canon0, finalAssign, cfg.gamma)
      else Quality.modularity(canon0, finalAssign, cfg.gamma)
    val nComm = finalAssign.select("community").distinct().count()
    Result(finalAssign, level + 1, q, nComm, sweeps)
  }

  // ---------------------------------------------------------------------
  // movement (reference inc_movement, throughput mode)
  // ---------------------------------------------------------------------

  final case class MovementOut(assign: DataFrame, changed: DataFrame,
      affected: DataFrame, sweeps: Int, moves: Long)

  /** BSP local-move phase. `assign` = (v, community, subcomm);
    * `active0` = (v) frontier. Returns updated assignment, the changed
    * set B, and the refinement-affected set K (both (v) DataFrames).
    */
  def movement(adj: DataFrame, deg: DataFrame, m2: Double, assign: DataFrame,
      active0: DataFrame, cfg: Config, sink: MetricsSink,
      level: Int, nodeSize: Option[DataFrame] = None): MovementOut = {

    val spark = adj.sparkSession
    import spark.implicits._
    // node sizes in base vertices (CPM gain); level 0 = all ones
    val sz = nodeSize.getOrElse(
      assign.select(col("v"), lit(1L).as("size"))).select("v", "size")
    var a = assign
    var active = active0.select(col("v")).ckpt
    var changed = Seq.empty[Long].toDF("v")
    var affected = Seq.empty[Long].toDF("v")
    var sweep = 0
    var totalMoves = 0L
    var frontierN = active.count()
    val nVerts = a.count()

    // stale snapshot of community degrees and sizes (throughput.rs:62-166),
    // computed from the full assignment ONCE and then maintained
    // incrementally from the applied moves (cdeg[old] -= d_v,
    // cdeg[new] += d_v — the reference's sequential bookkeeping at
    // hit_leiden.rs:267-268): a moves-sized job per sweep instead of a
    // full-table aggregation
    var commDeg = a.join(deg, "v").join(sz, "v")
      .groupBy(col("community"))
      .agg(sum("deg").as("cdeg"), sum("size").as("csize"))
      .ckpt

    while (frontierN > 0 && sweep < cfg.maxSweeps) {
      val t0 = System.nanoTime()

      // gather: active vertices' neighbor weights by neighbor community;
      // a full frontier (cold-start first sweep) skips the semi-join.
      // Self-loops are excluded: a supernode's self-loop travels with it,
      // so it cancels out of the move gain — counting it into wCur (as the
      // reference's neighbor loop does, hit_leiden.rs:234-239) freezes
      // movement on aggregated graphs, which the reference never reaches
      // (its public run() is single-level). Self-loops still count in
      // degrees and m, per the modularity convention.
      val act0 =
        if (frontierN >= nVerts) adj
        else adj.join(active.withColumnRenamed("v", "src"), Seq("src"),
          "left_semi")
      val act = act0.where(col("src") =!= col("dst"))
      val aByDst = a.select(col("v").as("dst"), col("community").as("nbrComm"))
      val byComm =
        if (cfg.saltFactor > 1) {
          // explicit skew split: hub destinations (degree > hotDegree) are
          // joined through saltFactor sub-keys with the assignment row
          // replicated per salt, then re-aggregated — the shuffled-hash
          // join otherwise sends a hub's entire neighbor list to one task
          val hot = deg.where(col("deg") > cfg.hotDegree)
            .select(col("v").as("dst")).ckpt
          val coldJ = act.join(hot, Seq("dst"), "left_anti")
            .join(aByDst.hint("shuffle_hash"), "dst")
            .select(col("src"), col("nbrComm"), col("weight"))
          val saltVals = array((0 until cfg.saltFactor).map(lit): _*)
          val hotJ = act.join(hot, Seq("dst"), "left_semi")
            .withColumn("salt", pmod(xxhash64(col("src")),
              lit(cfg.saltFactor)))
            .join(aByDst.join(hot, Seq("dst"), "left_semi")
              .withColumn("salt", explode(saltVals)), Seq("dst", "salt"))
            .select(col("src"), col("nbrComm"), col("weight"))
          coldJ.unionAll(hotJ).groupBy(col("src"), col("nbrComm"))
            .agg(sum("weight").as("wTo"))
        } else {
          act.join(aByDst.hint("shuffle_hash"), "dst")
            .groupBy(col("src"), col("nbrComm"))
            .agg(sum("weight").as("wTo"))
        }

      // wCur (weight to own community) via a window over the same src
      // partitioning — no self-join, no duplicated subtree
      val cur = a.select(col("v").as("src"), col("community").as("curComm"))
      val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
      val j = byComm.join(cur, "src")
        .withColumn("wCur",
          sum(when(col("nbrComm") === col("curComm"), col("wTo"))
            .otherwise(lit(0.0))).over(wSrc))

      // modularity gain = (wTo-wCur)/2m + g*d_v*(cdegCur-d_v-cdegCand)/(2m)^2
      // (hit_leiden.rs:250-255); CPM gain = (wTo-wCur) - g*sz_v*(csizeCand
      // - csizeCur + sz_v) (paper Def. 2 with node sizes in base vertices).
      // Stale community stats by construction.
      val gainExpr =
        if (cfg.useCpm)
          (col("wTo") - col("wCur")) - lit(cfg.gamma) * col("szv") *
            (col("csizeCand") - col("csizeCur") + col("szv"))
        else
          (col("wTo") - col("wCur")) / m2 +
            lit(cfg.gamma) * col("dv") *
            (col("cdegCur") - col("dv") - col("cdegCand")) / (m2 * m2)
      val cand = j.where(col("nbrComm") =!= col("curComm"))
        .join(deg.select(col("v").as("src"), col("deg").as("dv")), "src")
        .join(sz.select(col("v").as("src"), col("size").as("szv")), "src")
        .join(commDeg.select(col("community").as("curComm"),
          col("cdeg").as("cdegCur"), col("csize").as("csizeCur")), "curComm")
        .join(commDeg.select(col("community").as("nbrComm"),
          col("cdeg").as("cdegCand"), col("csize").as("csizeCand")),
          "nbrComm")
        .withColumn("gain", gainExpr)
        .where(col("gain") > 0)

      // deterministic argmax: best gain, ties to the smallest community id
      // (reference deterministic.rs tie policy)
      val wantMoves = cand.groupBy(col("src").as("v"))
        .agg(max_by(col("nbrComm"),
          struct(col("gain"), negate(col("nbrComm")))).as("newComm"))
        .ckpt

      // hash-parity gating (see scaladoc): apply a deterministic half now,
      // keep the gated half in the frontier for the next superstep
      val parity = pmod(xxhash64(col("v"), lit(sweep)), lit(2))
      val counts = wantMoves.groupBy(parity.as("p")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nWant = counts.values.sum
      val nMoves = counts.getOrElse(0L, 0L)
      val moves = wantMoves.where(parity === 0)
      val gated = wantMoves.where(parity === 1).select("v")

      if (nWant == 0) {
        sink.add(IterMetric("leiden.movement", level, sweep, messages = -1,
          movesAccepted = 0, frontier = frontierN, qualityDelta = 0.0,
          seconds = (System.nanoTime() - t0) / 1e9))
        frontierN = 0
      } else if (nMoves == 0) {
        // everyone gated this sweep; retry them next sweep
        active = gated.ckpt
        frontierN = nWant
        sink.add(IterMetric("leiden.movement", level, sweep, messages = -1,
          movesAccepted = 0, frontier = frontierN, qualityDelta = 0.0,
          seconds = (System.nanoTime() - t0) / 1e9))
      } else {
        totalMoves += nMoves
        val aNew = a.join(moves, Seq("v"), "left")
          .select(col("v"),
            coalesce(col("newComm"), col("community")).as("community"),
            col("subcomm"))
          .ckpt

        // incremental community-degree/size update from the applied moves
        val mvDeg = moves
          .join(a.select(col("v"), col("community").as("oldComm")), "v")
          .join(deg.select(col("v"), col("deg").as("dv")), "v")
          .join(sz.select(col("v"), col("size").as("szv")), "v")
        val cdegDelta = mvDeg.select(explode(array(
          struct(col("oldComm").as("community"), negate(col("dv")).as("d"),
            negate(col("szv")).as("s")),
          struct(col("newComm").as("community"), col("dv").as("d"),
            col("szv").as("s")))).as("x"))
          .select(col("x.community"), col("x.d"), col("x.s"))
          .groupBy("community").agg(sum("d").as("d"), sum("s").as("s"))
        commDeg = commDeg.join(cdegDelta, Seq("community"), "full")
          .select(col("community"),
            (coalesce(col("cdeg"), lit(0.0)) + coalesce(col("d"), lit(0.0)))
              .as("cdeg"),
            (coalesce(col("csize"), lit(0L)) + coalesce(col("s"), lit(0L)))
              .as("csize"))
          .ckpt

        // next frontier: gated movers plus neighbors of applied movers now
        // in a different community (hit_leiden.rs:270-273, post-barrier)
        val mvEdges = moves.select(col("v").as("src"), col("newComm"))
          .join(adj, "src")
        val nextActive = mvEdges
          .join(aNew.select(col("v").as("dst"), col("community").as("dcomm")),
            "dst")
          .where(col("dcomm") =!= col("newComm"))
          .select(col("dst").as("v"))
          .unionAll(gated)
          .distinct()
          .ckpt

        // K: mover and neighbor sharing a (pre-move) subcommunity
        // (hit_leiden.rs:274-277)
        val scPairs = mvEdges
          .join(a.select(col("v").as("src"), col("subcomm").as("scu")), "src")
          .join(a.select(col("v").as("dst"), col("subcomm").as("scv")), "dst")
          .where(col("scu") === col("scv"))
        val newAffected = scPairs.select(explode(array(col("src"), col("dst")))
          .as("v"))

        // accumulate lazily; dedup once at the end (moves/a/adj are all
        // checkpointed, so the union lineage stays shallow)
        changed = changed.unionAll(moves.select("v"))
        affected = affected.unionAll(newAffected)
        sink.add(IterMetric("leiden.movement", level, sweep, messages = -1,
          movesAccepted = nMoves, frontier = frontierN, qualityDelta = 0.0,
          seconds = (System.nanoTime() - t0) / 1e9))
        a = aNew
        active = nextActive
        frontierN = active.count()
      }
      sweep += 1
    }
    MovementOut(a, changed.distinct(), affected.distinct(), sweep,
      totalMoves)
  }

  // ---------------------------------------------------------------------
  // refinement (reference inc_refinement, throughput mode)
  // ---------------------------------------------------------------------

  final case class RefinementOut(assign: DataFrame, refined: DataFrame,
      rounds: Int)

  def refinement(adj: DataFrame, deg: DataFrame, m2: Double,
      assign: DataFrame, affected: DataFrame, cfg: Config, sink: MetricsSink,
      level: Int, isInitial: Boolean,
      nodeSize: Option[DataFrame] = None): RefinementOut = {

    val spark = adj.sparkSession
    val sz = nodeSize.getOrElse(
      assign.select(col("v"), lit(1L).as("size"))).select("v", "size")
    var a = assign
    var refined: DataFrame = null

    if (isInitial) {
      // identity subcommunities are all singletons — no split possible;
      // everyone is refined (hit_leiden.rs:373-379)
      refined = a.select("v")
    } else {
      // --- phase 1: connected-component split of affected subcommunities
      // (hit_leiden.rs:296-371, BFS -> distributed hash-min CC restricted
      // to intra-subcommunity edges)
      val affScs = a.join(affected.select("v"), Seq("v"), "left_semi")
        .select(col("subcomm")).distinct().ckpt
      val members = a.join(affScs, Seq("subcomm"), "left_semi")
      val intra = adj
        .join(a.select(col("v").as("src"), col("subcomm").as("scu")), "src")
        .join(a.select(col("v").as("dst"), col("subcomm").as("scv")), "dst")
        .where(col("scu") === col("scv"))
        .join(affScs.withColumnRenamed("subcomm", "scu"), Seq("scu"),
          "left_semi")
        .where(col("src") < col("dst")) // canonical, drop self-loops
        .select("src", "dst")
      val comps = ConnectedComponents.run(intra,
        vertices = Some(members.select("v")), sink = MetricsSink.discard)
        .components // (v, component = min member id)
      // every component takes its min-member id as the new subcommunity id
      // (divergence from largest-keeps-id — see object scaladoc)
      val relabeled = a.join(comps, Seq("v"), "left")
        .select(col("v"), col("community"),
          coalesce(col("component"), col("subcomm")).as("newSc"),
          col("subcomm"))
      refined = relabeled.where(col("newSc") =!= col("subcomm")).select("v")
        .ckpt
      a = relabeled.select(col("v"), col("community"),
        col("newSc").as("subcomm")).ckpt
    }

    // --- phase 2: merge singleton subcommunities within their community
    // (hit_leiden.rs:417-482; BSP rounds, see scaladoc for the anti-swap
    // guard replacing the sequential degree-ascending order)
    var round = 0
    var moved = 1L
    while (moved > 0 && round < cfg.maxRefineRounds) {
      val t0 = System.nanoTime()
      // scn = member count at this level (the singleton test is on level
      // vertices, hit_leiden.rs:420); scbase = total base vertices (CPM)
      val scSizes = a.join(sz, "v").groupBy("subcomm")
        .agg(count(lit(1)).as("scn"), sum("size").as("scbase"))
        .ckpt
      val scDeg = a.join(deg, "v").groupBy("subcomm")
        .agg(sum("deg").as("scdeg")).ckpt

      val singles = a.join(refined, Seq("v"), "left_semi")
        .join(scSizes.where(col("scn") === 1).select("subcomm"),
          Seq("subcomm"), "left_semi")
        .select(col("v").as("src"), col("community").as("myComm"),
          col("subcomm").as("mySc"))

      val g = adj.join(singles, "src")
        .join(a.select(col("v").as("dst"), col("community").as("nComm"),
          col("subcomm").as("nSc")), "dst")
        .where(col("nComm") === col("myComm")) // within community only
        .where(col("src") =!= col("dst")) // self-loops cancel out of gain
      val bySc = g.groupBy(col("src"), col("mySc"), col("nSc"))
        .agg(sum("weight").as("wTo"))
      val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
      val withCur = bySc.withColumn("wCur",
        sum(when(col("nSc") === col("mySc"), col("wTo")).otherwise(lit(0.0)))
          .over(wSrc))

      val refGain =
        if (cfg.useCpm)
          // singleton of base size sz_v merging into nSc of base size
          // scbase: (wTo - wCur) - gamma * sz_v * scbase
          (col("wTo") - coalesce(col("wCur"), lit(0.0))) -
            lit(cfg.gamma) * col("szv") * col("scbase")
        else
          (col("wTo") - coalesce(col("wCur"), lit(0.0))) / m2 +
            lit(cfg.gamma) * col("dv") *
            (col("scdegCur") - col("dv") - col("scdegCand")) / (m2 * m2)
      val cand = withCur.where(col("nSc") =!= col("mySc"))
        .join(deg.select(col("v").as("src"), col("deg").as("dv")), "src")
        .join(sz.select(col("v").as("src"), col("size").as("szv")), "src")
        .join(scDeg.select(col("subcomm").as("mySc"),
          col("scdeg").as("scdegCur")), "mySc")
        .join(scDeg.select(col("subcomm").as("nSc"),
          col("scdeg").as("scdegCand")), "nSc")
        .join(scSizes.select(col("subcomm").as("nSc"), col("scn"),
          col("scbase")), "nSc")
        .withColumn("gain", refGain)
        .where(col("gain") > 0)
        // anti-swap guard: merging into another singleton only flows
        // toward the smaller subcommunity id
        .where(col("scn") > 1 || col("nSc") < col("mySc"))

      val moves = cand.groupBy(col("src").as("v"))
        .agg(max_by(col("nSc"), struct(col("gain"), negate(col("nSc"))))
          .as("newSc"))
        .ckpt
      moved = moves.count()
      if (moved > 0) {
        a = a.join(moves, Seq("v"), "left")
          .select(col("v"), col("community"),
            coalesce(col("newSc"), col("subcomm")).as("subcomm"))
          .ckpt
      }
      sink.add(IterMetric("leiden.refinement", level, round, messages = -1,
        movesAccepted = moved, frontier = -1, qualityDelta = 0.0,
        seconds = (System.nanoTime() - t0) / 1e9))
      round += 1
    }
    RefinementOut(a, refined, round)
  }
}
