package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected simple graph.
  *
  * Not in the reference repo; added per the north rule ("triangle counts
  * exactly"). Algorithm: degree-based edge orientation + per-edge
  * adjacency-list intersection (the "edge iterator" with orientation).
  * Orienting every edge from its lower-(degree, id) endpoint to its
  * higher one bounds each vertex's out-degree by O(sqrt(E)), which is
  * what keeps the per-edge work from exploding on hub vertices at web
  * scale (a pure id orientation would put every hub's closing work in
  * one task; degree orientation is the skew handling).
  *
  * Each triangle {a,b,c} with oriented edges a->b, a->c, b->c is found
  * exactly once: at edge (a,b) as c in N+(a) /\ N+(b). The intersection
  * form evaluates |E| rows (each doing O(outdeg) set work) instead of
  * materializing the |wedges| >> |E| wedge stream a self-join would —
  * measured 5x faster at sf0.1 (93M wedges, 39.5M triangles) with
  * identical results.
  */
object TriangleCount {

  /** Total triangle count in the graph. */
  def total(edges: DataFrame): Long = {
    val r = closing(edges).select(size(col("cs")).cast("long").as("n"))
      .agg(sum("n")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** (v, triangles): number of triangles each vertex participates in.
    * Vertices in no triangle (including isolated ones in `edges`) get 0.
    *
    * Credit assignment per closing row (u, w, cs): u and w each gain
    * |cs| (they sit in every triangle the edge closes), each c in cs
    * gains 1 — so every triangle credits exactly its three vertices.
    */
  def perVertex(edges: DataFrame): DataFrame = {
    val verts = graft.graph.EdgeOps.vertices(edges)
    val cl = closing(edges)
    val credits = cl
      .select(col("u").as("v"), size(col("cs")).cast("long").as("n"))
      .unionAll(cl.select(col("w").as("v"),
        size(col("cs")).cast("long").as("n")))
      .unionAll(cl.select(explode(col("cs")).as("v"), lit(1L).as("n")))
    val perV = credits.groupBy("v").agg(sum("n").as("triangles"))
    verts.join(perV, Seq("v"), "left")
      .select(col("v"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** For each oriented edge (u, w): cs = N+(u) /\ N+(w), the vertices
    * closing a triangle over it. Edges whose w has no out-neighbors are
    * dropped (they close nothing — inner join). */
  private def closing(edges: DataFrame): DataFrame = {
    val simple = edges
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

    // unweighted degree on the symmetrized view
    val deg = simple.select(col("src").as("v"))
      .unionAll(simple.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

    // orient u -> v iff (deg(u), u) < (deg(v), v)
    val withDeg = simple
      .join(deg.select(col("v").as("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("v").as("dst"), col("deg").as("ddst")), "dst")
    val oriented = withDeg.select(
      when(struct(col("dsrc"), col("src")) < struct(col("ddst"), col("dst")),
        struct(col("src").as("u"), col("dst").as("w")))
        .otherwise(struct(col("dst").as("u"), col("src").as("w")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .ckpt

    // out-adjacency lists: <= V rows, O(E) total payload, every list
    // bounded by the orientation's O(sqrt(E)) out-degree cap
    val adjList = oriented.groupBy(col("u"))
      .agg(collect_list(col("w")).as("nbrs")).ckpt

    // The ckpt drops plan statistics (GraftStatsReset), so Catalyst sees
    // defaultSizeInBytes and never auto-broadcasts; gate explicitly on
    // the (known) materialized size. Payload is O(E) list entries per
    // side and BOTH projections are broadcast at once, so the byte
    // estimate is 2 x ~24 B per oriented edge against the heap-derived
    // budget (graft.util.Bcast). Above the budget both joins shuffle.
    val nOriented = oriented.count()
    def side(df: DataFrame): DataFrame =
      graft.util.Bcast.ifFits(df, nOriented, bytesPerRow = 48)
    // the probe side drives the whole closing pipeline (both joins chain
    // inside one codegen stage when broadcast): AQE's size-based
    // coalescing packs this few-MB table into 1-2 partitions and would
    // run the O(E * outdeg) evaluation nearly single-threaded, so spread
    // it across the session parallelism explicitly
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    oriented.repartition(parts)
      .join(side(adjList.select(col("u"), col("nbrs").as("nu"))), "u")
      .join(side(adjList.select(col("u").as("w"), col("nbrs").as("nw"))),
        "w")
      .select(col("u"), col("w"),
        array_intersect(col("nu"), col("nw")).as("cs"))
  }
}
