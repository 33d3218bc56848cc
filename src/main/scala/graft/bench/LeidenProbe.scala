package graft.bench

import org.apache.spark.sql.SparkSession
import graft.algo.Leiden
import graft.run.MetricsSink

/** Diagnostic: Leiden sweep cadence on the driver-query lineitem graph. */
object LeidenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sink = new MetricsSink
    val t0 = System.nanoTime()
    val r = Leiden.run(graft.queries.Queries.lineitemGraph(spark, sfDir),
      Leiden.Config(), sink)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"LPROBE total=$sec%.1f q=${r.modularity}%.4f " +
      s"levels=${r.levels} comms=${r.communityCount} sweeps=${r.sweepsPerLevel}")
    sink.all.foreach { m =>
      println(f"LPROBE ${m.algo} level=${m.level} it=${m.iteration} " +
        f"frontier=${m.frontier} moves=${m.movesAccepted} sec=${m.seconds}%.2f")
    }
    spark.stop()
  }
}
