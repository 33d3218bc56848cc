package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected simple graph.
  *
  * Not in the reference repo; added per the north rule ("triangle counts
  * exactly"). Algorithm: degree-based edge orientation + wedge join —
  * the standard shuffle-efficient formulation. Orienting every edge from
  * its lower-(degree, id) endpoint to its higher one bounds each vertex's
  * out-degree by O(sqrt(E)), which is what keeps the wedge join from
  * exploding on hub vertices at web scale (a pure id orientation would put
  * every hub wedge in one task; degree orientation is the skew handling).
  *
  * Each triangle {a,b,c} appears exactly once as an oriented wedge
  * a->b, b->c closed by a->c.
  */
object TriangleCount {

  /** Total triangle count in the graph: a straight count of the closed
    * oriented wedge stream — no explode, no per-vertex aggregation. */
  def total(edges: DataFrame): Long = triangles(edges).count()

  /** (v, triangles): number of triangles each vertex participates in.
    * Vertices in no triangle (including isolated ones in `edges`) get 0.
    */
  def perVertex(edges: DataFrame): DataFrame = {
    val verts = graft.graph.EdgeOps.vertices(edges)
    val perV = triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("triangles"))
    verts.join(perV, Seq("v"), "left")
      .select(col("v"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Each triangle once as (a, b, c). */
  private def triangles(edges: DataFrame): DataFrame = {
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

    // The ckpt drops plan statistics (GraftStatsReset), so Catalyst sees
    // defaultSizeInBytes (128 MB) and never auto-broadcasts the oriented
    // table even when it fits in one task. It is already materialized, so
    // count it and broadcast explicitly below a row threshold (10M rows
    // ~ 160 MB of two longs): the wedge join and the closing join then
    // run map-side with zero shuffle of the wedge stream. Above the
    // threshold (real web graphs) both joins shuffle as before.
    val nOriented = oriented.count()
    def side(df: DataFrame): DataFrame =
      if (nOriented <= 10_000_000L) broadcast(df) else df
    val e1 = oriented.select(col("u").as("a"), col("w").as("b"))
    val e2 = oriented.select(col("u").as("b"), col("w").as("c"))
    val e3 = oriented.select(col("u").as("a2"), col("w").as("c2"))
    e1.join(side(e2), "b")
      .join(side(e3), col("a") === col("a2") && col("c") === col("c2"))
      .select(col("a"), col("b"), col("c"))
  }
}
