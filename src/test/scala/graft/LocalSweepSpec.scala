package graft

import org.apache.spark.sql.functions._
import graft.algo.{Incremental, Leiden, Quality}

/** Round-5: driver-local movement sweeps (Leiden.localMovePhase) — the
  * warm-update hot path — against the distributed BSP sweep loop they
  * replace. The local loop claims EXACT parity (same snapshots, gain
  * argmax, revert gating), so these tests compare assignments exactly,
  * not just quality bands.
  */
class LocalSweepSpec extends SparkSpecBase {

  test("gateParity matches Spark's pmod(xxhash64(v, lit(sweep)), 2)") {
    import spark.implicits._
    val vs = Seq(0L, 1L, 2L, 7L, 42L, 1001L, 99999L, Long.MaxValue / 7,
      123456789L, 33L)
    for (sweep <- 0 until 6) {
      val fromSpark = vs.toDF("v")
        .select(col("v"),
          pmod(xxhash64(col("v"), lit(sweep)), lit(2)).as("p"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1) == 1L)).toMap
      vs.foreach { v =>
        assert(Leiden.Xx.gateParity(v, sweep) == fromSpark(v),
          s"parity mismatch at v=$v sweep=$sweep")
      }
    }
  }

  test("warm updates: local sweeps == forced-distributed sweeps exactly") {
    val g = graft.source.CodeTableSynth.sbmEdges(spark, 500, nBlocks = 4,
      degIntra = 4, degInter = 1, seed = 11)
    val (init, batches) = Incremental.paperSplit(g, 0.7, 50, 3)
    val cfgL = Leiden.Config(localMoveSweeps = true)
    val cfgD = Leiden.Config(localMoveSweeps = false)
    var stL = Incremental.initial(init, cfgL)
    var stD = Incremental.initial(init, cfgD)
    var k = 0
    for (b <- batches) {
      stL = Incremental.update(stL, b, cfgL)
      stD = Incremental.update(stD, b, cfgD)
      k += 1
      val aL = toMapLL(stL.assign.select(col("v"), col("community")))
      val aD = toMapLL(stD.assign.select(col("v"), col("community")))
      assert(aL == aD, s"batch $k: local-sweep assignment diverges from " +
        s"the distributed path (${aL.count { case (v, c) => aD(v) != c }}" +
        " vertices differ)")
      val sL = toMapLL(stL.assign.select(col("v"), col("subcomm")))
      val sD = toMapLL(stD.assign.select(col("v"), col("subcomm")))
      assert(sL == sD, s"batch $k: subcomm divergence")
    }
    val qL = Quality.modularity(stL.canon,
      stL.assign.select(col("v"), col("community")), 1.0)
    val qD = Quality.modularity(stD.canon,
      stD.assign.select(col("v"), col("community")), 1.0)
    assert(math.abs(qL - qD) < 1e-12, s"quality diverges: $qL vs $qD")
  }

  test("deletion batch through the local path stays exact vs distributed") {
    val g = graft.source.CodeTableSynth.sbmEdges(spark, 300, nBlocks = 4,
      degIntra = 4, degInter = 1, seed = 3)
    val (init, batches) = Incremental.paperSplit(g, 0.8, 30, 1)
    val cfgL = Leiden.Config(localMoveSweeps = true)
    val cfgD = Leiden.Config(localMoveSweeps = false)
    var stL = Incremental.initial(init, cfgL)
    var stD = Incremental.initial(init, cfgD)
    val ins = batches.head
    stL = Incremental.update(stL, ins, cfgL)
    stD = Incremental.update(stD, ins, cfgD)
    val del = ins.limit(12).select(col("src"), col("dst"),
      negate(col("weight")).as("weight"))
    stL = Incremental.update(stL, del, cfgL)
    stD = Incremental.update(stD, del, cfgD)
    val aL = toMapLL(stL.assign.select(col("v"), col("community")))
    val aD = toMapLL(stD.assign.select(col("v"), col("community")))
    assert(aL == aD, "deletion batch diverges between sweep paths")
  }
}
