package graft.bench

import org.apache.spark.sql.SparkSession

/** Diagnostic: time a named subset of the driver queries without paying
  * for a full Bench run. Not part of the driver contract.
  *
  *   SPARK_GRAFT_QUERIES=q_triangles,q_lpa SPARK_GRAFT_SF_DIR=... \
  *     sbt "runMain graft.bench.QProbe"
  *
  * Each query runs twice (cold, then warm) with the same session config
  * as Bench part 1.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "q_triangles")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; trial <- 0 to 1) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"QPROBE $name trial=$trial rows=$rows " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
