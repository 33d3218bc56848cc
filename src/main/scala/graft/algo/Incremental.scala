package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps
import graft.run.MetricsSink

import scala.collection.mutable

/** The "HIT" in HIT-Leiden: incremental maintenance of a Leiden partition
  * under a batch of edge insertions/deletions, touching only affected
  * vertices.
  *
  * Delta convention matches the reference (signed weight: alpha > 0
  * insert, alpha < 0 delete — /root/reference/src/core/algorithm/
  * hit_leiden.rs:167-180). Delta activation seeds the movement frontier
  * exactly as inc_movement's first loop (hit_leiden.rs:166-186).
  *
  * Per-batch cost is bound by the DELTA, not the graph:
  *
  *  - graph state (canonical edges, degrees, total weight, the level-1
  *    supergraph) is maintained by [[EdgeOps.mergeDelta]]-style broadcast
  *    merges and arithmetic patches — no full-table shuffle anywhere;
  *  - movement/refinement are frontier-limited (and their per-sweep
  *    gathers broadcast the frontier, [[Leiden.movement]]);
  *  - the supergraph is maintained through the reference's own delta
  *    machinery: [[IncAggregation.apply]] (hit_leiden.rs:487-563) emits
  *    a signed supergraph delta from the batch + the refinement
  *    re-seatings, merged into the live supergraph;
  *  - upper levels re-solve over that (orders-of-magnitude smaller)
  *    supergraph, finishing locally once it fits
  *    ([[Leiden.Config.localSolveEdges]]).
  *
  * The remaining per-batch O(V) work (assignment carry, the supernode
  * community seed aggregation) is over the VERTEX table, which at link-
  * graph scale is far smaller than the edge table; at petabyte scale
  * both canon and assignment live as bucketed tables and these become
  * bucket-pruned merges too — the durable edge-side form exists as
  * [[graft.graph.BucketedEdges]].
  */
object Incremental {

  /** Driver-side mirror of a LOCAL-SOLVE-SIZED supergraph: canonical
    * (src, dst, weight) primitive arrays sorted by (src, dst). Only ever
    * built when the supergraph already passes `localSolveEdges` (i.e. it
    * is driver-collectable by definition); maintained per batch by a
    * linear signed-delta merge, which removes the per-batch re-collect +
    * re-pack of millions of unchanged edges from the warm path. The
    * content invariant (cache == superCanon table) is exact: the merge
    * applies the same w0+dw sum and the same |w| > eps drop as
    * [[EdgeOps.mergeDelta]], and two-operand float addition is
    * commutative, so not even the float rounding differs. */
  final case class SuperEdges(src: Array[Long], dst: Array[Long],
      w: Array[Double])

  /** Maintained upper-level composition for the DEFAULT live path: the
    * level-1 supergraph itself is the sorted-array mirror
    * ([[SuperEdges]], merged per batch by [[mergeSuperArrays]]); this
    * carries the composed (subcomm -> community) map the last warm
    * solve produced, so the next batch seeds its warm solve directly —
    * no O(V) carried-community aggregation + collect per batch
    * (hit_leiden.rs:565-599 def_update: the upper state is maintained,
    * not re-derived). A FRESH instance is built every batch from the
    * solve output and never mutated, so a caller that kept the
    * pre-batch State can re-apply its batch — value semantics without
    * a deep copy. */
  final case class UpperComm(composed: mutable.LongMap[Long])

  /** Linear merge of a canonical signed delta into the sorted cache. */
  private[algo] def mergeSuperArrays(c: SuperEdges,
      delta: Array[(Long, Long, Double)], eps: Double): SuperEdges = {
    val d = delta.sortBy(e => (e._1, e._2))
    val n = c.src.length; val m = d.length
    val oSrc = new Array[Long](n + m)
    val oDst = new Array[Long](n + m)
    val oW = new Array[Double](n + m)
    var i = 0; var j = 0; var k = 0
    def cmp(ci: Int, dj: Int): Int = {
      val s = java.lang.Long.compare(c.src(ci), d(dj)._1)
      if (s != 0) s else java.lang.Long.compare(c.dst(ci), d(dj)._2)
    }
    def emit(s: Long, t: Long, wt: Double): Unit =
      if (math.abs(wt) > eps) { oSrc(k) = s; oDst(k) = t; oW(k) = wt; k += 1 }
    while (i < n && j < m) {
      val r = cmp(i, j)
      if (r < 0) { emit(c.src(i), c.dst(i), c.w(i)); i += 1 }
      else if (r > 0) { emit(d(j)._1, d(j)._2, d(j)._3); j += 1 }
      else { emit(c.src(i), c.dst(i), c.w(i) + d(j)._3); i += 1; j += 1 }
    }
    while (i < n) { emit(c.src(i), c.dst(i), c.w(i)); i += 1 }
    while (j < m) { emit(d(j)._1, d(j)._2, d(j)._3); j += 1 }
    SuperEdges(java.util.Arrays.copyOf(oSrc, k),
      java.util.Arrays.copyOf(oDst, k), java.util.Arrays.copyOf(oW, k))
  }

  /** Durable-canon option: the level-0 edge table lives in a
    * [[graft.graph.BucketedEdges]] bucket-partitioned parquet store and
    * every delta merge is a bucket-pruned read-merge-overwrite of only the
    * touched buckets — the executed form of the petabyte-scale story
    * (reference durable-state intent: src/core/graph/backend.rs). */
  final case class DurableCanon(path: String, nBuckets: Int)

  /** Durable-assignment option: the (v, community, subcomm) table lives
    * in a [[graft.state.BucketedAssign]] bucket-partitioned store and
    * each warm batch upserts only its changed rows — with the edge-side
    * [[DurableCanon]] this completes the durable PartitionState contract
    * (reference src/core/partition/state.rs:4-16). */
  final case class DurableAssign(path: String, nBuckets: Int)

  /** Persistent engine state between batches.
    *
    * @param canon  live canonical edge table (level 0)
    * @param assign (v, community, subcomm) for every vertex
    * @param m2     cached 2 * total weight
    * @param deg    (v, deg) weighted degrees (nullable: derived on demand)
    * @param superCanon live level-1 supergraph = contract(canon, subcomm)
    *   (nullable: derived on demand — e.g. after resume from checkpoint)
    * @param maxId  id watermark for fresh subcommunity allocation
    *   (largest-component-keeps-id splits allocate above it)
    * @param durable when set, `canon` is backed by (and [[update]] merges
    *   into) the bucket-partitioned store at this path
    */
  final case class State(canon: DataFrame, assign: DataFrame, m2: Double,
      deg: DataFrame = null, superCanon: DataFrame = null,
      maxId: Long = Long.MinValue,
      /** batches applied since the last full flatten of the degree
        * overlay — the vertex-table analog of movement's lazy-overlay
        * cadence: the per-batch degree patch stays a lazy broadcast-join
        * chain (delta-sized work) and is materialized O(V) only every
        * 4th batch. */
      epoch: Int = 0,
      durable: Option[DurableCanon] = None,
      /** driver-side sorted-array mirror of superCanon, present only
        * while the supergraph is local-solve-sized (see [[SuperEdges]]);
        * purely an optimization — absent after resume, rebuilt on the
        * next batch's collect */
      superCache: Option[SuperEdges] = None,
      /** driver-side maintained upper hierarchy (levels >= 1, see
        * [[LocalHier]]) — the reference-faithful fixed-level pipeline's
        * state, used only when `cfg.hierRebuildUpper` is false. Absent
        * after resume; rebuilt by the next batch's local re-solve. */
      hierCache: Option[LocalHier.HState] = None,
      /** maintained composed (subcomm -> community) map for the DEFAULT
        * live path (see [[UpperComm]]); absent after resume — rebuilt by
        * the next batch's re-solve fallback. */
      upper: Option[UpperComm] = None,
      /** maintained DISTRIBUTED level-1 assignment
        * (v = supernode, community, subcomm), present only while the
        * supergraph exceeds `localSolveEdges` (r6: the delta-scoped
        * per-level maintenance past the driver bound — reference
        * hit_leiden.rs:104-136, 565-599). Each over-bound batch runs the
        * frontier-limited movement/refinement over the supergraph with
        * the supergraph DELTA as the activation, instead of a full
        * re-solve whose cost is proportional to supergraph size. Absent
        * after resume (or while the supergraph fits the driver bound) —
        * the next over-bound batch initializes it with one full
        * re-solve. */
      upperAssign: DataFrame = null)

  /** Fill derivable fields absent after a resume or an old-format call:
    * degrees, the live supergraph (contract by subcomm — the invariant
    * superCanon == contract(canon, assign.subcomm) holds at every batch
    * boundary) and the id watermark. */
  def hydrate(st: State, eps: Double = 1e-9): State = {
    val deg =
      if (st.deg != null) st.deg
      else EdgeOps.degrees(EdgeOps.symmetrize(st.canon)).ckpt
    val sup =
      if (st.superCanon != null) st.superCanon
      else contractBySubcomm(st.canon, st.assign, eps).ckpt
    val maxId =
      if (st.maxId != Long.MinValue) st.maxId
      else {
        val r = st.assign
          .agg(greatest(max("v"), max("community"), max("subcomm"))).collect()
        if (r.isEmpty || r(0).isNullAt(0)) 0L else r(0).getLong(0)
      }
    st.copy(deg = deg, superCanon = sup, maxId = maxId)
  }

  private def contractBySubcomm(canon: DataFrame, assign: DataFrame,
      eps: Double): DataFrame = {
    val sc = assign.select(col("v"), col("subcomm"))
    EdgeOps.compress(canon
      .join(sc.select(col("v").as("src"), col("subcomm").as("scu")), "src")
      .join(sc.select(col("v").as("dst"), col("subcomm").as("scv")), "dst")
      .select(col("scu").as("src"), col("scv").as("dst"), col("weight")),
      eps)
  }

  def initial(edges: DataFrame, cfg: Leiden.Config = Leiden.Config(),
      sink: MetricsSink = MetricsSink.discard,
      durable: Option[DurableCanon] = None): State = {
    val canon0 = EdgeOps.compress(edges, cfg.eps).ckpt
    // durable mode: seed the bucket store and compute off a reader over
    // it, so the solved state is provably derived from the durable bytes
    val canon = durable.fold(canon0) { d =>
      graft.graph.BucketedEdges.write(canon0, d.path, d.nBuckets)
      graft.graph.BucketedEdges.read(edges.sparkSession, d.path).ckpt
    }
    val m2 = 2.0 * EdgeOps.totalWeight(canon)
    val verts = EdgeOps.vertices(canon)
    val init = verts.select(col("v"), col("v").as("community"),
      col("v").as("subcomm")).ckpt
    if (m2 == 0.0)
      return hydrate(State(canon, init, 0.0, durable = durable), cfg.eps)
    val adj = EdgeOps.symmetrize(canon).ckpt
    val deg = EdgeOps.degrees(adj).ckpt
    val mv = Leiden.movement(adj, deg, m2, init, verts, cfg, sink, 0)
    val ref = Leiden.refinement(adj, deg, m2, mv.assign, verts, cfg, sink, 0,
      isInitial = true)
    // the state's superCanon must be the SAME materialized table the
    // cache mirrors (resolveSuper only moves communities, never
    // subcomms, so contract-by-subcomm of the final assignment equals
    // this one — but recomputing it would re-run float sums in a
    // different aggregation order and break the cache's exactness)
    val sc0 = contractBySubcomm(canon, ref.assign, cfg.eps).ckpt
    val so = resolveSuper(sc0, ref.assign, cfg, sink)
    hydrate(State(canon, so.out, m2, deg = deg, superCanon = sc0,
      durable = durable, superCache = so.cache, hierCache = so.hier,
      upper = so.upper, upperAssign = so.upperAssign.orNull), cfg.eps)
  }

  /** Solve the (small) supergraph with the carried communities as the
    * seed and compose the result back onto the base assignment. A batch
    * can only refine the partition, never regress below it — but
    * movement only moves vertices toward *neighbor* communities
    * (hit_leiden.rs:234-240), so a community a deletion internally
    * disconnected would never split on its own: enforce Leiden's
    * connectivity guarantee on the seed first by replacing each carried
    * community with its connected components on the supergraph. */
  /** resolveSuper result: the composed base assignment plus whichever
    * maintained upper-state form the taken path produces. */
  private final case class SuperOut(out: DataFrame,
      cache: Option[SuperEdges], hier: Option[LocalHier.HState],
      upper: Option[UpperComm], upperAssign: Option[DataFrame],
      freshUsed: Long)

  private def resolveSuper(superCanon: DataFrame, assign: DataFrame,
      cfg: Leiden.Config, sink: MetricsSink,
      cache: Option[SuperEdges] = None,
      deltaH: Option[DataFrame] = None,
      upperPrev: Option[DataFrame] = None,
      freshIdBase: Long = 0L): SuperOut = {
    val spark = superCanon.sparkSession
    import spark.implicits._
    val debugT = sys.env.get("GRAFT_DEBUG_TIMING").contains("1")
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (debugT) {
      val now = System.nanoTime()
      System.err.println(f"[sup] $phase%-14s ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }
    // lazy: the local-solve path collects it in ONE action; only the
    // distributed path (which reads it several times) checkpoints it
    val carried0 = assign.groupBy(col("subcomm").as("v"))
      .agg(min(col("community")).as("community"))
    mark("carried-agg")

    val nSuper = cache match {
      case Some(c) => c.src.length.toLong
      case None => superCanon.count()
    }
    var cacheOut: Option[SuperEdges] = None
    var hierOut: Option[LocalHier.HState] = None
    var upperOut: Option[UpperComm] = None
    var upperAssignOut: Option[DataFrame] = None
    var freshUsed = 0L
    val superRes =
      if (cfg.localSolveEdges > 0 && nSuper <= cfg.localSolveEdges) {
        // supergraph fits: connectivity repair (union-find) AND the full
        // hierarchy solve run sequentially on PRIMITIVE arrays — one
        // collect (or none, when the driver-side cache is warm) instead
        // of a dozen fixed-cost distributed jobs per batch
        val ce = cache.getOrElse {
          val rows = superCanon.select("src", "dst", "weight").collect()
          val order = Array.range(0, rows.length)
          // keep the mirror sorted by (src, dst) so per-batch delta
          // merges are a linear two-pointer pass
          val sorted = order.sortBy(i => (rows(i).getLong(0),
            rows(i).getLong(1)))
          val eSrc = new Array[Long](rows.length)
          val eDst = new Array[Long](rows.length)
          val eW = new Array[Double](rows.length)
          var i = 0
          while (i < rows.length) {
            val r = rows(sorted(i))
            eSrc(i) = r.getLong(0); eDst(i) = r.getLong(1)
            eW(i) = r.getDouble(2)
            i += 1
          }
          SuperEdges(eSrc, eDst, eW)
        }
        cacheOut = Some(ce)
        val cmM = carried0.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        mark("collect")
        val szM =
          if (cfg.useCpm) assign.groupBy(col("subcomm").as("v"))
            .agg(count(lit(1)).as("size")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          else Map.empty[Long, Long]
        val repaired = LocalLeiden.repairConnectivity(ce.src, ce.dst, cmM)
        mark("repair")
        val solved =
          if (cfg.incrementalHierarchy && !cfg.hierRebuildUpper) {
            // reference-faithful fixed-level mode: build the maintained
            // per-level hierarchy (LocalHier) — subsequent batches run
            // its per-level delta pipeline instead of re-solving
            val (h, composed) = LocalHier.init(ce.src, ce.dst, ce.w, repaired,
              szM, cfg)
            hierOut = Some(h)
            composed
          } else LocalLeiden.solve(ce.src, ce.dst, ce.w, szM, repaired,
            cfg, canonicalSorted = true)
        if (cfg.incrementalHierarchy && cfg.hierRebuildUpper) {
          // DEFAULT live mode: stash the composed map — the next batch
          // seeds its warm mirror solve from it (no carried collect)
          val m = mutable.LongMap.empty[Long]
          solved.foreach { case (k, v) => m(k) = v }
          upperOut = Some(UpperComm(m))
        }
        mark("local-solve")
        val out = solved.toSeq.toDF("v", "community")
        mark("toDF")
        out
      } else if (deltaH.isDefined && upperPrev.isDefined) {
        // DELTA-SCOPED distributed upper maintenance (r6, VERDICT r5 ask
        // #2; reference hit_leiden.rs:104-136, 565-599): past the driver
        // bound, the maintained level-1 assignment is updated by the
        // SAME frontier-limited machinery the base level uses —
        // activation = the supergraph delta's endpoints, movement +
        // refinement scoped to them — instead of a full re-solve whose
        // cost is proportional to supergraph size. Per-batch job count
        // is fixed; only a handful of jobs scan the O(E_1) supergraph
        // once (materialize, degree, total weight), every other step is
        // delta-bounded (and the movement sweeps go driver-local
        // whenever the delta frontier fits the byte budget).
        val superM = superCanon.ckpt
        val m2s = 2.0 * EdgeOps.totalWeight(superM)
        val adj1 = EdgeOps.symmetrize(superM)
        val deg1 = EdgeOps.degrees(adj1).ckpt
        val dV1 = EdgeOps.vertices(deltaH.get).ckpt
        // supernodes this batch introduced enter as singletons
        val newSup = dV1.join(upperPrev.get.select("v"), Seq("v"),
          "left_anti").ckpt
        val up0 =
          if (newSup.isEmpty) upperPrev.get
          else upperPrev.get.unionAll(newSup.select(col("v"),
            col("v").as("community"), col("v").as("subcomm")))
        // scoped connectivity repair (the delta-bounded form of the
        // re-solve path's full pre-repair below): only communities the
        // delta touches can have been disconnected by a deletion —
        // replace each with its connected components on the supergraph
        // (labels = min member, disjoint across communities so no
        // collisions). Untouched communities pass through.
        val affComms = broadcast(up0
          .join(broadcast(dV1), Seq("v"), "left_semi")
          .select("community").distinct()).ckpt
        val members = up0.join(affComms, Seq("community"), "left_semi")
          .ckpt
        val memComm = members.select(col("v"), col("community"))
        val intra = superM
          .join(memComm.withColumnRenamed("v", "src")
            .withColumnRenamed("community", "cu"), "src")
          .join(memComm.withColumnRenamed("v", "dst")
            .withColumnRenamed("community", "cv"), "dst")
          .where(col("cu") === col("cv"))
          .select("src", "dst")
        val repaired = ConnectedComponents
          .run(intra, vertices = Some(members.select("v")),
            localSolveVerts = 100000)
          .components
        val repChanged = members
          .join(repaired.withColumnRenamed("component", "newComm"),
            Seq("v"))
          .where(col("newComm") =!= col("community"))
          .ckpt
        val up1 =
          if (repChanged.isEmpty) up0
          else up0.join(broadcast(repChanged.select(col("v"),
            col("newComm"))), Seq("v"), "left")
            .select(col("v"),
              coalesce(col("newComm"), col("community")).as("community"),
              col("subcomm"))
        mark("upper-repair")
        // activation: delta endpoints + repair-moved supernodes
        val activated = dV1.select("v")
          .unionAll(repChanged.select("v")).distinct()
        val sizes1 =
          if (cfg.useCpm) Some(assign.groupBy(col("subcomm").as("v"))
            .agg(count(lit(1)).as("size")).ckpt)
          else None
        val mv1 = Leiden.movement(adj1, deg1, m2s, up1.ckpt, activated,
          cfg, sink, 1, nodeSize = sizes1)
        val aff1 = activated.unionAll(mv1.affected).distinct().ckpt
        val ref1 = Leiden.refinement(adj1, deg1, m2s, mv1.assign, aff1,
          cfg, sink, 1, isInitial = false, nodeSize = sizes1,
          freshIdBase = freshIdBase)
        freshUsed = ref1.freshUsed
        val upNext = ref1.assign.ckpt
        upperAssignOut = Some(upNext)
        mark("upper-delta")
        upNext.select(col("v"), col("community"))
      } else {
        val carriedCk = carried0.ckpt
        val superNodes = carriedCk.select("v")
        val intraSuper = superCanon
          .join(carriedCk.select(col("v").as("src"),
            col("community").as("cu")), "src")
          .join(carriedCk.select(col("v").as("dst"),
            col("community").as("cv")), "dst")
          .where(col("cu") === col("cv"))
          .select("src", "dst")
        val carried = ConnectedComponents
          .run(intraSuper, vertices = Some(superNodes))
          .components
          .select(col("v"), col("component").as("community"))
        val sizes =
          if (cfg.useCpm) Some(assign.groupBy(col("subcomm").as("v"))
            .agg(count(lit(1)).as("size")).ckpt)
          else None
        // the supergraph IS level >= 1 of the hierarchy: its own level 0
        // may local-solve as soon as it fits. Initialize the maintained
        // distributed level-1 assignment from this solve (subcomms
        // restart as singletons; the next batch's scoped refinement
        // re-derives them) so subsequent over-bound batches take the
        // delta-scoped branch above.
        val solved = Leiden.run(superCanon,
          cfg.copy(localSolveMinLevel = 0), sink,
          initial = Some(carried), initialSizes = sizes).assignment
        upperAssignOut = Some(solved.select(col("v"), col("community"),
          col("v").as("subcomm")).ckpt)
        solved
      }

    // LEFT join with a carried-community fallback: both solver paths
    // derive their vertex set from supergraph EDGES, so a subcommunity a
    // deletion batch left edge-free (an isolated supernode) never appears
    // in superRes — an inner join would silently drop its vertices from
    // the assignment. Isolated supernodes keep their carried community
    // (they have no neighbors to merge with, so that IS the solve result).
    val out = assign.select(col("v"), col("subcomm"),
        col("community").as("oldComm"))
      .join(superRes.select(col("v").as("subcomm"),
        col("community").as("newComm")), Seq("subcomm"), "left")
      .select(col("v"),
        coalesce(col("newComm"), col("oldComm")).as("community"),
        col("subcomm"))
      .ckpt
    mark("compose")
    SuperOut(out, cacheOut, hierOut, upperOut, upperAssignOut, freshUsed)
  }

  /** Warm upper-level solve over the maintained mirror — the DEFAULT
    * live path (replaces the per-batch re-solve): seed communities come
    * from the maintained composition ([[UpperComm]], no O(V) carried
    * aggregation + collect), connectivity repair runs dense
    * ([[LocalLeiden.repairDense]], no per-batch sort/boxing) and the
    * hierarchy solve runs pre-densified ([[LocalLeiden.solveDense]], no
    * per-batch dedup/sort pack). All driver CPU on primitive arrays;
    * the only Spark work a caller pays is the composition join.
    *
    * @return (full (subcomm -> community) composition rows, next
    *         maintained composition) */
  private def warmSolveSuper(cache: SuperEdges,
      composedOld: mutable.LongMap[Long], freshSeeds: Map[Long, Long],
      szM: Map[Long, Long], cfg: Leiden.Config)
      : (Array[(Long, Long)], UpperComm) = {
    val nE = cache.src.length
    if (nE == 0) {
      // every supernode is isolated: composition keeps old labels
      val m = mutable.LongMap.empty[Long]
      composedOld.foreach { case (k, v) => m(k) = v }
      freshSeeds.foreach { case (k, v) => if (!m.contains(k)) m(k) = v }
      return (Array.empty, UpperComm(m))
    }
    // verts: the mirror is sorted by (src, dst), so distinct srcs are a
    // linear scan; dsts need one sort; then a two-array merge
    val sSrc = {
      val a = new Array[Long](nE)
      var m = 0; var e = 0
      while (e < nE) {
        if (m == 0 || cache.src(e) != a(m - 1)) { a(m) = cache.src(e); m += 1 }
        e += 1
      }
      java.util.Arrays.copyOf(a, m)
    }
    val sDst = {
      val a = cache.dst.clone()
      java.util.Arrays.sort(a)
      var m = 0; var j = 0
      while (j < a.length) {
        if (m == 0 || a(j) != a(m - 1)) { a(m) = a(j); m += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(a, m)
    }
    val verts = {
      val a = new Array[Long](sSrc.length + sDst.length)
      var i = 0; var j = 0; var m = 0
      while (i < sSrc.length && j < sDst.length) {
        val x = if (sSrc(i) <= sDst(j)) { val v = sSrc(i); i += 1; v }
          else { val v = sDst(j); j += 1; v }
        if (m == 0 || x != a(m - 1)) { a(m) = x; m += 1 }
      }
      while (i < sSrc.length) {
        if (m == 0 || sSrc(i) != a(m - 1)) { a(m) = sSrc(i); m += 1 }
        i += 1
      }
      while (j < sDst.length) {
        if (m == 0 || sDst(j) != a(m - 1)) { a(m) = sDst(j); m += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(a, m)
    }
    val n = verts.length
    // dense endpoints: src rides the sort order (two-pointer), dst
    // binary-searches
    val dSrc = new Array[Int](nE)
    val dDst = new Array[Int](nE)
    var vi = 0
    var e = 0
    while (e < nE) {
      while (verts(vi) != cache.src(e)) vi += 1
      dSrc(e) = vi
      dDst(e) = java.util.Arrays.binarySearch(verts, cache.dst(e))
      e += 1
    }
    // seed labels: maintained composition, fresh-seat seeds for level-1
    // nodes this batch introduced, identity fallback
    val labels = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = verts(i)
      labels(i) = composedOld.getOrElse(v,
        freshSeeds.getOrElse(v, v))
      i += 1
    }
    LocalLeiden.repairDense(verts, dSrc, dDst, labels)
    val sizes =
      if (cfg.useCpm)
        Array.tabulate(n)(i => szM.getOrElse(verts(i), 1L).toDouble)
      else Array.fill(n)(1.0)
    val out = LocalLeiden.solveDense(verts, dSrc, dDst, cache.w, sizes,
      labels, cfg)
    // next maintained composition: old entries (isolated supernodes keep
    // their label for future re-connection) overwritten by the solve
    val composedNew = mutable.LongMap.empty[Long]
    composedOld.foreach { case (k, v) => composedNew(k) = v }
    val rows = new Array[(Long, Long)](out.size)
    var r = 0
    out.foreach { case (k, v) =>
      composedNew(k) = v
      rows(r) = (k, v); r += 1
    }
    (rows, UpperComm(composedNew))
  }

  /** Apply one signed delta batch, warm-starting from `state`.
    *
    * Faithful to the reference's per-batch pipeline (hit_leiden.rs:85-151
    * at level 0 + inc_aggregation/def_update for the hierarchy): delta
    * activation -> frontier movement -> refinement (largest-keeps-id
    * splits + singleton merges) -> IncAggregation supergraph delta ->
    * upper-level re-solve over the maintained supergraph -> composition.
    */
  def update(state0: State, delta: DataFrame,
      cfg: Leiden.Config = Leiden.Config(),
      sink: MetricsSink = MetricsSink.discard,
      /** distinct-delta-id count above which the new-vertex probe switches
        * from a driver literal predicate to a distributed anti join */
      bulkIdThreshold: Long = 100_000L,
      /** monotone batch id for durable-mode idempotency: a merge already
        * recorded in the store (crash between merge and checkpoint
        * commit) is skipped on replay instead of double-applied */
      batchId: Option[Long] = None): State = {

    // phase timing to stderr when GRAFT_DEBUG_TIMING=1 (diagnostics only)
    val debugT = sys.env.get("GRAFT_DEBUG_TIMING").contains("1")
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (debugT) {
      val now = System.nanoTime()
      System.err.println(f"[inc] $phase%-14s ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }

    val deltaC = EdgeOps.compress(delta, cfg.eps).ckpt
    if (deltaC.isEmpty) return hydrate(state0, cfg.eps)
    val dW = {
      val r = deltaC.agg(sum("weight")).collect()(0)
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }

    // durable replay detection: if the store already recorded this batch
    // (crash AFTER the bucket merge but BEFORE the checkpoint commit),
    // state0's canon/m2 — read back from the store — are one batch AHEAD
    // of the committed assignment. Rebuild the pre-delta view (a
    // delta-sized signed un-merge overlay, no store write) so the batch
    // replays identically, and the store merge below no-ops.
    val replayed = state0.durable.exists(d => batchId.exists(b =>
      graft.graph.BucketedEdges.lastApplied(delta.sparkSession, d.path)
        .exists(_ >= b)))
    val state =
      if (!replayed) hydrate(state0, cfg.eps)
      else {
        // EXACTNESS CONTRACT (ADVICE r5): this signed un-merge is exact
        // only for integer-valued weights below 2^53 — (w + d) - d == w
        // holds exactly for integers in double, so the reconstructed
        // pre-state (and hence the replayed Outcome) is bit-identical to
        // the pre-crash batch. With fractional weights the un-merge can
        // be off by an ulp and reordered float sums can flip gain ties:
        // the replay would still be a VALID solve of the same graph, but
        // not guaranteed identical to what the store recorded. Every
        // ingest path in this engine produces multiplicity (integer)
        // weights; a future fractional-weight source must either disable
        // durable replay or reconcile against the stored assignment.
        val negDelta = deltaC.select(col(EdgeOps.SRC), col(EdgeOps.DST),
          negate(col(EdgeOps.W)).as(EdgeOps.W))
        val preCanon = EdgeOps.mergeDelta(state0.canon, negDelta, cfg.eps)
          .ckpt
        // deg/superCanon were not set by readState; hydrate re-derives
        // them from the reconstructed pre-delta canon
        hydrate(state0.copy(canon = preCanon, m2 = state0.m2 - 2.0 * dW,
          deg = null, superCanon = null, superCache = None), cfg.eps)
      }
    mark("hydrate+delta")

    // --- graph-state maintenance: delta-bound, no full-table shuffles
    // in-memory default: broadcast merge onto the checkpointed table.
    // durable mode: bucket-pruned staged merge into the BucketedEdges
    // store — only the delta's buckets are read and rewritten, and a
    // batch already applied under `batchId` is skipped — then the live
    // canon is a fresh reader over the store.
    val newCanon = state.durable match {
      case Some(d) =>
        graft.graph.BucketedEdges.mergeDelta(delta.sparkSession, d.path,
          deltaC, d.nBuckets, cfg.eps, batchId)
        graft.graph.BucketedEdges.read(delta.sparkSession, d.path).ckpt
      case None =>
        // NOTE (r6, measured): deferring this ckpt to the every-4th-batch
        // cadence (like the degree overlay) made warm batches 1.5-2.5x
        // SLOWER — movement/refinement run many jobs per batch and each
        // replayed the stacked broadcast anti/semi-join overlay, paying a
        // broadcast build per layer per job. The per-batch O(E)
        // materialization is the cheaper side of that trade here.
        EdgeOps.mergeDelta(state.canon, deltaC, cfg.eps).ckpt
    }
    val m2 = state.m2 + 2.0 * dW

    // new endpoints enter as singletons. For ordinary (batch-bounded)
    // deltas the "which delta ids are new" set is computed with a driver
    // round-trip over the delta id list + one map-side scan of the
    // assignment — a shuffled anti join would re-sort the whole vertex
    // table per batch. A BULK delta (backfill, re-ingest) would turn
    // isInCollection into a multi-million-element literal predicate
    // (plan-size explosion, driver memory), so above 100k distinct ids
    // the probe falls back to a distributed anti join — one key shuffle,
    // the right cost when the delta is itself graph-sized.
    val spark = delta.sparkSession
    import spark.implicits._
    val dV = EdgeOps.vertices(deltaC).ckpt
    val nDV = dV.count()
    val (newVerts, dMax) =
      if (nDV <= bulkIdThreshold) {
        val dIds = dV.collect().map(_.getLong(0))
        val existing = state.assign
          .where(col("v").isInCollection(dIds)).select("v")
          .collect().map(_.getLong(0)).toSet
        val newIds = dIds.filterNot(existing)
        (newIds.toSeq.toDF("v"),
          if (dIds.isEmpty) None else Some(dIds.max))
      } else {
        val nv = dV.join(state.assign.select("v"), Seq("v"), "left_anti")
          .ckpt
        val m = dV.agg(max("v")).collect()(0)
        (nv, if (m.isNullAt(0)) None else Some(m.getLong(0)))
      }
    val hasNew = !newVerts.isEmpty
    // new-singleton rows are delta-sized; the union is applied lazily on
    // top of the (checkpointed) carried assignment — no O(V) rewrite here
    val assign0 =
      if (!hasNew) state.assign
      else state.assign.unionAll(
        newVerts.select(col("v"), col("v").as("community"),
          col("v").as("subcomm")))

    // degree patch: broadcast left-outer add for existing vertices plus
    // delta-only degrees for new ones — no vertex-table shuffle. Kept as
    // a LAZY overlay (each consumer replays a map-side broadcast join
    // over the last materialized table) and flattened O(V) only every
    // 4th batch: the last per-batch term that scaled with |V| not |delta|.
    val deltaDeg = EdgeOps.degrees(EdgeOps.symmetrize(deltaC))
      .withColumnRenamed("deg", "dd").ckpt
    val degPatched = state.deg.join(broadcast(deltaDeg), Seq("v"), "left")
      .select(col("v"),
        (col("deg") + coalesce(col("dd"), lit(0.0))).as("deg"))
    val degNew = deltaDeg
      .join(broadcast(newVerts), Seq("v"), "left_semi")
      .select(col("v"), col("dd").as("deg"))
    val deg0 = degPatched.unionAll(degNew)
    val deg = if (state.epoch % 4 == 3) deg0.ckpt else deg0
    mark("graph-state")

    // --- delta activation (hit_leiden.rs:166-186); the delta side is
    // broadcast-built so the assignment streams map-side, never shuffles
    val d1 = broadcast(deltaC)
      .join(assign0.select(col("v").as("src"), col("community").as("cu"),
        col("subcomm").as("scu")), "src")
    val d = broadcast(d1)
      .join(assign0.select(col("v").as("dst"), col("community").as("cv"),
        col("subcomm").as("scv")), "dst")
      .ckpt
    val activated = d.where(
      (col("weight") > 0 && col("cu") =!= col("cv")) ||
        (col("weight") < 0 && col("cu") === col("cv")))
      .select(explode(array(col("src"), col("dst"))).as("v")).distinct()
      .ckpt
    val k0 = d.where(col("scu") === col("scv"))
      .select(explode(array(col("src"), col("dst"))).as("v")).distinct()

    if (m2 == 0.0)
      return hydrate(State(newCanon, assign0, 0.0, durable = state.durable),
        cfg.eps)

    val adj = EdgeOps.symmetrize(newCanon)
    mark("activation")

    // --- frontier-limited movement + refinement at level 0
    val mv = Leiden.movement(adj, deg, m2, assign0, activated, cfg, sink, 0)
    mark("movement")
    val affected = k0.unionAll(mv.affected).distinct().ckpt
    // the watermark must clear every vertex id seen so far INCLUDING the
    // ones this batch introduced (they arrive as their own singleton
    // subcomm/community ids): allocating fresh split ids from the stale
    // state.maxId could alias a new vertex's id and silently contract two
    // unrelated subcommunities together in the supergraph
    val freshIdBase = dMax.fold(state.maxId)(math.max(state.maxId, _))
    val ref = Leiden.refinement(adj, deg, m2, mv.assign, affected, cfg, sink,
      0, isInitial = false, freshIdBase = freshIdBase)
    mark("refinement")
    val maxId = freshIdBase + ref.freshUsed
    val assign1 = ref.assign

    // --- supergraph maintenance via the reference's delta machinery.
    // R must contain EXACTLY the changed vertices (hit_leiden.rs:509-511
    // dedup guard assumes it); refinement's refined set is a superset
    // when a phase-2 merge lands a vertex back on its old id.
    val sPre0 = assign0.select(col("v"), col("subcomm").as("sc"))
    val sCur = assign1.select(col("v"), col("subcomm").as("sc"))
    val refR = broadcast(assign1
      .join(broadcast(ref.refined.select("v").distinct()), Seq("v"),
        "left_semi"))
      .join(sPre0.withColumnRenamed("sc", "scPre"), "v")
      .where(col("subcomm") =!= col("scPre"))
      .select("v").ckpt
    // the warm mirror/hierarchy path collects the delta-sized deltaH
    // anyway — evaluate the delta join pipeline ONCE via that collect
    // (materialize=false) and hand downstream consumers a local relation;
    // the fallback path (nothing maintained) keeps the ckpt'd DataFrame
    val willCollect = state.superCache.isDefined ||
      state.hierCache.isDefined || state.upper.isDefined
    val (deltaH0, _) = IncAggregation(adj, deltaC, sPre0, sCur, refR,
      cfg.eps, materialize = !willCollect)
    val dRows: Array[(Long, Long, Double)] =
      if (willCollect)
        deltaH0.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
      else null
    val deltaH =
      if (willCollect) {
        val sp = adj.sparkSession
        import sp.implicits._
        dRows.toSeq.toDF("src", "dst", "weight")
      } else deltaH0
    // the mirror path never SCANS superCanon (the sorted-array mirror is
    // the live level-1 graph), so the O(E_1) materialization runs on the
    // deg-overlay cadence instead of every batch; between flattens the
    // lazy mergeDelta overlay (broadcast anti/semi joins) stacks at most
    // 4 deep, and fallback/resume/checkpoint consumers evaluate it as-is
    val newSuper0 = EdgeOps.mergeDelta(state.superCanon, deltaH, cfg.eps)
    val newSuper = if (state.epoch % 4 == 3) newSuper0.ckpt else newSuper0
    // maintain the driver-side mirror with the SAME signed delta — a
    // fallback re-solve then skips its multi-million-row re-collect.
    // First batch after resume (VERDICT r5 #7): the persisted upper
    // composition survives the checkpoint but the mirror does not —
    // rebuild it from the hydrated pre-delta supergraph (one gated
    // collect; the same sort resolveSuper's local init applies) so the
    // warm mirror solve engages instead of a full re-solve. Exactness
    // note: the hydrated supergraph re-aggregates weights in a fresh
    // order, exact for the integer-valued weights every ingest produces.
    val rebuiltCache: Option[SuperEdges] =
      if (state.superCache.isEmpty && state.upper.isDefined &&
          dRows != null && cfg.localSolveEdges > 0 &&
          state.superCanon.count() <= cfg.localSolveEdges) {
        val rows = state.superCanon.select("src", "dst", "weight")
          .collect()
        val order = Array.range(0, rows.length)
        val sorted = order.sortBy(i => (rows(i).getLong(0),
          rows(i).getLong(1)))
        val eSrc = new Array[Long](rows.length)
        val eDst = new Array[Long](rows.length)
        val eW = new Array[Double](rows.length)
        var i = 0
        while (i < rows.length) {
          val r = rows(sorted(i))
          eSrc(i) = r.getLong(0); eDst(i) = r.getLong(1)
          eW(i) = r.getDouble(2)
          i += 1
        }
        Some(SuperEdges(eSrc, eDst, eW))
      } else None
    val mergedCache = state.superCache.orElse(rebuiltCache)
      .map(mergeSuperArrays(_, dRows, cfg.eps))
    mark("aggregation")

    // --- upper levels. DEFAULT live path (reference hit_leiden.rs:85-151
    // + 565-599 def_update): the maintained MIRROR is the level-1
    // supergraph, the maintained composition seeds a warm in-memory
    // hierarchy solve (dense repair + pre-densified solve, all primitive
    // arrays) — no carried aggregation, no collect, no per-batch
    // sort/pack. Fixed-level mode (hierRebuildUpper=false): LocalHier's
    // reference-faithful per-level delta pipeline. Fallback (no
    // maintained state after resume / supergraph outgrew the local
    // bound / flag off): the re-solve, which REBUILDS the maintained
    // state when it lands local.
    val useMirror = cfg.incrementalHierarchy && cfg.hierRebuildUpper &&
      dRows != null && mergedCache.isDefined && state.upper.isDefined &&
      cfg.localSolveEdges > 0 &&
      mergedCache.get.src.length <= cfg.localSolveEdges
    val useHier = cfg.incrementalHierarchy && !cfg.hierRebuildUpper &&
      dRows != null &&
      state.hierCache.exists(h => cfg.localSolveEdges > 0 &&
        h.level1Edges + dRows.length <= cfg.localSolveEdges)
    val (assign2, cacheOut, hierOut, upperOut, upperAssignOut,
        consumedFresh): (DataFrame, Option[SuperEdges],
        Option[LocalHier.HState], Option[UpperComm], Option[DataFrame],
        Long) =
      if (useMirror) {
        val mc = mergedCache.get
        val composedOld = state.upper.get.composed
        // community seeds for level-1 nodes this batch introduces (fresh
        // split seats / new singletons): their community in the
        // post-movement base assignment — one delta-sized lookup
        val newIds = dRows.iterator.flatMap(e => Iterator(e._1, e._2))
          .filter(v => !composedOld.contains(v)).toSet
        val seed: Map[Long, Long] =
          if (newIds.isEmpty) Map.empty
          else assign1
            .where(col("subcomm").isInCollection(newIds))
            .groupBy("subcomm").agg(min("community"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val szM =
          if (cfg.useCpm) assign1.groupBy(col("subcomm").as("v"))
            .agg(count(lit(1)).as("size")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          else Map.empty[Long, Long]
        val (rows, upperNew) = warmSolveSuper(mc, composedOld, seed, szM,
          cfg)
        val superRes = rows.toSeq.toDF("subcomm", "newComm")
        val out = assign1
          .select(col("v"), col("subcomm"), col("community").as("oldComm"))
          .join(broadcast(superRes), Seq("subcomm"), "left")
          .select(col("v"),
            coalesce(col("newComm"), col("oldComm")).as("community"),
            col("subcomm"))
          .ckpt
        (out, mergedCache, None, Some(upperNew), None, 0L)
      } else if (useHier) {
        // copy before mutating: State is value-semantic (a caller that
        // kept the pre-batch State must be able to re-apply the batch —
        // the crash-replay and branching-test contract)
        val h = state.hierCache.get.deepCopy
        val l1 = h.levels.head
        // community seeds for level-1 nodes this batch introduces (fresh
        // split seats / new singletons): their community in the
        // post-movement base assignment — one delta-sized lookup
        val newIds = dRows.iterator.flatMap(e => Iterator(e._1, e._2))
          .filter(v => !l1.comm.contains(v)).toSet
        val seed: Map[Long, Long] =
          if (newIds.isEmpty) Map.empty
          else assign1
            .where(col("subcomm").isInCollection(newIds))
            .groupBy("subcomm").agg(min("community"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val consumed = LocalHier.update(h, dRows, seed, cfg, maxId)
        val composed = LocalHier.composedLevel1(h)
        val superRes = composed.toSeq.toDF("subcomm", "newComm")
        val out = assign1
          .select(col("v"), col("subcomm"), col("community").as("oldComm"))
          .join(broadcast(superRes), Seq("subcomm"), "left")
          .select(col("v"),
            coalesce(col("newComm"), col("oldComm")).as("community"),
            col("subcomm"))
          .ckpt
        (out, mergedCache, Some(h), None, None, consumed)
      } else {
        val so = resolveSuper(newSuper, assign1, cfg, sink, mergedCache,
          deltaH = Some(deltaH),
          upperPrev = Option(state.upperAssign), freshIdBase = maxId)
        (so.out, so.cache, so.hier, so.upper, so.upperAssign, so.freshUsed)
      }
    mark("resolveSuper")
    State(newCanon, assign2, m2, deg = deg, superCanon = newSuper,
      maxId = maxId + consumedFresh, epoch = state.epoch + 1,
      durable = state.durable, superCache = cacheOut, hierCache = hierOut,
      upper = upperOut, upperAssign = upperAssignOut.orNull)
  }

  /** Deterministic cumulative delta batches replicating the reference's
    * benchmark splitter `paper_split(initial_ratio, batch_size, rounds,
    * seed)` (/root/reference/src/benchmark/dynamic_graph.rs:62-115):
    * shuffle edges by a seeded hash, first `initialRatio` = the initial
    * graph, then `rounds` batches of `batchSize` as insertions.
    *
    * Fully distributed AND skew-free: the global rank is computed as a
    * per-bucket row_number plus driver-side bucket offsets, where buckets
    * are the hash's top 16 bits (so bucket order IS hash order). The
    * driver reduction is bounded by 2^16 rows regardless of |E|; no
    * single-partition window anywhere.
    */
  def paperSplit(edges: DataFrame, initialRatio: Double, batchSize: Int,
      rounds: Int, seed: Long = 42L): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    import spark.implicits._
    val hashed = edges
      .withColumn("_h", xxhash64(col("src"), col("dst"), lit(seed)))
      .withColumn("_b", shiftrightunsigned(col("_h"), 48))
      .localCheckpoint(true)
    val counts = hashed.groupBy("_b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) =>
      val off = acc; acc += n; (b, off)
    }
    val offDf = offsets.toSeq.toDF("_b", "_off")
    val ranked = hashed.join(broadcast(offDf), "_b").withColumn("_rn",
      row_number().over(Window.partitionBy("_b")
        .orderBy(col("_h"), col("src"), col("dst"))) + col("_off"))
      .drop("_off")
    val total = acc
    val nInit = (total * initialRatio).toLong
    val init = ranked.where(col("_rn") <= nInit)
      .drop("_h", "_b", "_rn").ckpt
    val batches = (0 until rounds).map { r =>
      ranked.where(col("_rn") > nInit + r.toLong * batchSize &&
        col("_rn") <= nInit + (r + 1).toLong * batchSize)
        .drop("_h", "_b", "_rn").ckpt
    }
    (init, batches)
  }
}
