package graft.bench

import org.apache.spark.sql.SparkSession

/** Diagnostic: triangle-count plan + timing at sf0.1. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.queries.Queries.lineitemGraph(spark, sfDir)
    // warm the input
    g.localCheckpoint(true)
    var t0 = System.nanoTime()
    val n = graft.algo.TriangleCount.total(g)
    println(f"TPROBE total=$n cold=${(System.nanoTime() - t0) / 1e9}%.1fs")
    t0 = System.nanoTime()
    graft.algo.TriangleCount.total(g)
    println(f"TPROBE warm=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
