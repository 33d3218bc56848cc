package graft

import org.apache.spark.sql.functions._
import graft.algo.{Incremental, Leiden, Quality}

/** scratch diagnostic — not a spec; run via Test/runMain graft.ProbeHier */
object ProbeHier {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val g = graft.source.CodeTableSynth.sbmEdges(spark, 600, nBlocks = 4,
      degIntra = 4, degInter = 1, seed = 7)
    val (init, batches) = Incremental.paperSplit(g, 0.7, 60, 4)
    val cfgHier = Leiden.Config(incrementalHierarchy = true)
    val cfgSolve = Leiden.Config(incrementalHierarchy = false)
    def q(st: Incremental.State): Double =
      Quality.modularity(st.canon, st.assign.select(col("v"), col("community")), 1.0)
    var hier = Incremental.initial(init, cfgHier)
    var solve = Incremental.initial(init, cfgSolve)
    println(f"[probe] init: hier=${q(hier)}%.6f solve=${q(solve)}%.6f")
    var k = 0
    for (b <- batches) {
      hier = Incremental.update(hier, b, cfgHier)
      solve = Incremental.update(solve, b, cfgSolve)
      k += 1
      println(f"[probe] batch $k: hier=${q(hier)}%.6f solve=${q(solve)}%.6f")
    }
    spark.stop()
  }
}
