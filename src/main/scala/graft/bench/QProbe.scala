package graft.bench

import org.apache.spark.sql.SparkSession
import graft.algo.Leiden
import graft.run.MetricsSink
import graft.source.CodeTableSynth

/** Diagnostic: Leiden quality/convergence on a planted SBM. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "20000").toLong
    val maxSweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "40").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = CodeTableSynth.sbmEdges(spark, n, nBlocks = 32,
      degIntra = 6, degInter = 1).localCheckpoint(true)
    val sink = new MetricsSink
    val r = Leiden.run(edges, Leiden.Config(maxSweeps = maxSweeps), sink)
    println(s"QPROBE full modularity=${r.modularity} levels=${r.levels} " +
      s"communities=${r.communityCount} sweeps=${r.sweepsPerLevel}")
    val (init80, _) = graft.algo.Incremental.paperSplit(edges, 0.8, 500, 3)
    println(s"QPROBE init80 rows=${init80.count()} of ${edges.count()}")
    val st = graft.algo.Incremental.initial(init80,
      Leiden.Config(maxSweeps = maxSweeps))
    val qInc = graft.algo.Quality.modularity(st.canon,
      st.assign.select(org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.col("community")))
    val nInc = st.assign.select("community").distinct().count()
    println(s"QPROBE incremental-initial(init80) modularity=$qInc communities=$nInc")
    sink.all.filter(_.algo == "leiden.movement")
      .filter(m => m.iteration % 10 == 0 || m.movesAccepted < 50)
      .take(30).foreach { m =>
        println(s"QPROBE mv level=${m.level} sweep=${m.iteration} " +
          s"frontier=${m.frontier} moves=${m.movesAccepted} " +
          f"sec=${m.seconds}%.2f")
      }
    spark.stop()
  }
}
