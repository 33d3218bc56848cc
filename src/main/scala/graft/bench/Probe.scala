package graft.bench

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.source.CodeTableSynth
import graft.graph.EdgeOps

/** Diagnostic: per-phase timing of one PageRank-shaped superstep, to
  * locate serial bottlenecks in the scaling job. Not part of the driver
  * contract. */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = time("gen+ckpt edges") {
      val e = CodeTableSynth.sbmEdges(spark, n, 64, 8, 2, 0.001, 50).ckpt
      println(s"PROBE edges=${e.count()}")
      e
    }
    val canon = time("compress") { EdgeOps.compress(edges).ckpt }
    val adj = time("symmetrize+ckpt") { EdgeOps.symmetrize(canon).ckpt }
    println(s"PROBE adj=${adj.count()} parts=${adj.rdd.getNumPartitions}")
    val wdeg = time("degrees") { EdgeOps.degrees(adj).ckpt }
    val shares = time("shares") {
      adj.join(wdeg, adj("src") === wdeg("v"))
        .select(col("src"), col("dst"),
          (col("weight") / col("deg")).as("share")).ckpt
    }
    val verts = time("verts") { EdgeOps.vertices(canon).ckpt }
    var ranks = verts.withColumn("rank", lit(1e-6)).ckpt
    for (i <- 1 to 5) {
      ranks = time(s"superstep $i (join+agg+join, ckpt)") {
        val contribs = shares.join(ranks, shares("src") === ranks("v"))
          .select(col("dst").as("v"), (col("share") * col("rank")).as("c"))
        val sums = contribs.groupBy("v").agg(sum("c").as("mass"))
        verts.join(sums, Seq("v"), "left")
          .select(col("v"), coalesce(col("mass"), lit(0.0)).as("rank")).ckpt
      }
    }
    time("count-only superstep (no ckpt)") {
      val contribs = shares.join(ranks, shares("src") === ranks("v"))
        .select(col("dst").as("v"), (col("share") * col("rank")).as("c"))
      println("PROBE rows=" + contribs.groupBy("v").agg(sum("c")).count())
    }
    spark.stop()
  }
}
