package graft.bench

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1) — NOT part of the driver
  * contract (Bench.scala is frozen for measurement; this main exists so
  * optimization evidence can be gathered without touching it).
  *
  * For each named query (default: all SparkEntry queries):
  *  - writes `plans/r06/<name>_<suffix>.txt` with the formatted physical
  *    plan (`SPARK_GRAFT_PLAN_SUFFIX`, default "before"; empty = skip);
  *  - times `SPARK_GRAFT_TRIALS` (default 2) passes of the same
  *    `.count()` action Bench part 1 uses, reporting each trial and min;
  *  - optionally (`SPARK_GRAFT_NOOP=1`) also times a noop-sink write
  *    (guide §1.4: computes every column, no sink cost).
  *
  * Session config matches Bench part 1 exactly so numbers compare.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR",
      "/root/repo/plans/r06")
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
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
    if (suffix.nonEmpty) new java.io.File(planDir).mkdirs()

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      if (suffix.nonEmpty) {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$planDir/${name}_$suffix.txt"), plan)
      }
      var best = Double.MaxValue
      for (t <- 0 until trials) {
        spark.sparkContext.setJobDescription(s"$name trial=$t")
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        println(f"XBENCH $name trial=$t rows=$rows sec=$sec%.3f")
      }
      if (noop) {
        spark.sparkContext.setJobDescription(s"$name noop")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"XBENCH $name noop sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
      spark.sparkContext.setJobDescription(null)
      results += name -> best
    }
    val total = results.map(_._2).sum
    println("XBENCH-SUMMARY " + results.map { case (n, s) =>
      f"$n=$s%.3f" }.mkString(" ") + f" total=$total%.3f")
    spark.stop()
  }
}
