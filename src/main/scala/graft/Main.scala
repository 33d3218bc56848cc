package graft

import org.apache.spark.sql.SparkSession
import graft.run.Engine
import graft.algo.Leiden
import graft.graph.EdgeOps

/** spark-submit entry point — the analog of the reference CLI
  * (/root/reference/src/cli/options.rs:4-17, run.rs:6-37):
  *
  *   spark-submit --class graft.Main app.jar run    <edges.parquet> <ckptRoot> [gamma] [maxLevels] [mode]
  *   spark-submit --class graft.Main app.jar update <delta.parquet> <ckptRoot> [gamma] [maxLevels] [mode]
  *   spark-submit --class graft.Main app.jar resume <ckptRoot>
  *
  * mode: throughput (default) | deterministic — the reference's two
  * RunModes (config.rs); deterministic runs the sequential exact-identity
  * solver and requires the graph to fit on the driver.
  *
  * Edge parquet schema: (src LONG, dst LONG, weight DOUBLE nullable).
  * Prints a one-line JSON outcome (run id, quality, community count,
  * iterations) — the analog of the reference's report writer.
  */
object Main {

  /** The CLI body against a caller-owned session — separated from main()
    * so it is testable without creating/stopping a global session.
    * Returns (quality, communityCount, iterations, batch) when the
    * subcommand produces an outcome. */
  def runCli(spark: SparkSession,
      args: Array[String]): Option[(Double, Long, Int, Int)] = {
    require(args.length >= 2, "usage: run|update|resume <args...>")

    def cfg(root: String, rest: Array[String]) = Engine.Config(
      leiden = Leiden.Config(
        gamma = rest.lift(0).map(_.toDouble).getOrElse(1.0),
        maxLevels = rest.lift(1).map(_.toInt).getOrElse(10)),
      checkpointRoot = Some(root), runId = "run-0",
      mode = rest.lift(2).getOrElse("throughput"))

    args(0) match {
      case "run" =>
        val edges = EdgeOps.readParquet(spark, args(1))
        val o = Engine.run(edges, cfg(args(2), args.drop(3)))
        Some((o.quality, o.communityCount, o.iterations, o.batch))
      case "update" =>
        val delta = EdgeOps.readParquet(spark, args(1))
        val o = Engine.update(spark, delta, cfg(args(2), args.drop(3)))
        Some((o.quality, o.communityCount, o.iterations, o.batch))
      case "resume" =>
        Engine.resume(spark, Engine.Config(checkpointRoot = Some(args(1))))
          .map { df => (Double.NaN, df.count(), 0, -1) }
      case other => throw new IllegalArgumentException(s"unknown: $other")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = runCli(spark, args)
    out.foreach { case (q, c, it, b) =>
      println(s"""{"run_id":"run-0","batch":$b,"quality":$q,""" +
        s""""community_count":$c,"iterations":$it}""")
    }
    spark.stop()
  }
}
