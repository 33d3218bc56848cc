package graft.algo

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps
import graft.run.{IterMetric, MetricsSink}

/** Synchronous weighted label propagation (community detection baseline).
  *
  * Not present in the reference repo; added per the north rule. Semantics
  * (deterministic, so output is exactly reproducible across runs and
  * parallelism levels — the analog of the reference's deterministic
  * tie-breaking, /root/reference/src/core/algorithm/deterministic.rs:1-21):
  *
  *  - every vertex starts labeled with its own id;
  *  - each superstep, v adopts the label with the largest total incident
  *    weight among its neighbors' current labels; ties break to the
  *    smallest label id;
  *  - stop when no label changes or maxIter is hit (synchronous LPA can
  *    2-cycle on bipartite structures, hence the cap).
  *
  * One superstep = gather join + hash agg on (v,label) + deterministic
  * argmax via max_by(struct(weight, -label)) — no window shuffle needed.
  */
object LabelPropagation {

  final case class Result(labels: DataFrame, iterations: Int)

  def run(
      edges: DataFrame,
      vertices: Option[DataFrame] = None,
      maxIter: Int = 10,
      sink: MetricsSink = MetricsSink.discard): Result = {

    val canon = EdgeOps.compress(edges).where(col("src") =!= col("dst"))
      .ckpt
    val verts = vertices.map(_.select(col("v")).distinct())
      .getOrElse(EdgeOps.vertices(canon))
      .ckpt
    // small vertex sets: broadcast the label table into the gather so the
    // adjacency streams map-side every round — zero per-round shuffle of
    // either table. The ckpt drops stats, so this must be explicit; gated
    // on the (known) vertex count because at web scale the label table is
    // V-sized and must shuffle.
    val nVerts = verts.count()
    // ~32 B per (v, label) row against the heap-derived budget
    val bcastLabels = graft.util.Bcast.fits(nVerts, bytesPerRow = 32)
    // static side partitioned by the per-round join key (see CC/PageRank)
    // — only worth a shuffle when the per-round join itself shuffles
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val adj0 = EdgeOps.symmetrize(canon)
    val adj =
      (if (bcastLabels) adj0 else adj0.repartition(parts, col("dst"))).ckpt

    var labels = verts.withColumn("label", col("v")).ckpt
    var it = 0
    var done = nVerts == 0
    while (!done && it < maxIter) {
      val t0 = System.nanoTime()
      val byDst = labels.select(col("v").as("dst"), col("label"))
      val gathered =
        if (bcastLabels) adj.join(broadcast(byDst), "dst")
        else adj.join(byDst.hint("shuffle_hash"), "dst")
      val msgs = gathered
        .groupBy(col("src").as("v"), col("label"))
        .agg(sum(col("weight")).as("w"))
      // argmax weight, tie -> min label: max_by on (w, -label) is a single
      // hash agg, deterministic because (w, -label) pairs are unique per v
      val best = msgs.groupBy("v")
        .agg(max_by(col("label"), struct(col("w"), negate(col("label"))))
          .as("newLabel"))
      // the previous label rides along through the checkpoint so the
      // convergence check is a filter-count on the materialized table,
      // not a second join job per round (same pattern as CC)
      val stepped = labels.join(best, Seq("v"), "left")
        .select(col("v"), col("label").as("old"),
          coalesce(col("newLabel"), col("label")).as("label"))
        .ckpt

      val changed = stepped.where(col("label") =!= col("old")).count()
      val next = stepped.drop("old")
      sink.add(IterMetric("lpa", 0, it, messages = -1, movesAccepted = changed,
        frontier = -1, qualityDelta = 0.0,
        seconds = (System.nanoTime() - t0) / 1e9))
      labels = next
      it += 1
      done = changed == 0
    }
    Result(labels, it)
  }
}
