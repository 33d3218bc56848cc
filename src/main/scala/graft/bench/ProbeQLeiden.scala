package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{Leiden, Quality}
import graft.graph.EdgeOps
import graft.queries.Queries
import graft.util.Ckpt._

/** Diagnostic: per-piece timing of qLeiden (solve vs quality self-check). */
object ProbeQLeiden {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $tag%-18s ${(System.nanoTime()-t0)/1e9}%.2fs")
      r
    }
    for (pass <- 1 to 2) {
      System.err.println(s"[probe] --- pass $pass ---")
      val g = Queries.lineitemGraph(spark, sfDir)
      val res = t("leiden.run")(Leiden.run(g,
        Leiden.Config(localSolveLevel0Verts = 100000)))
      val canon = t("canon.ckpt")(EdgeOps.compress(g).ckpt)
      val assign = t("assign.ckpt")(
        res.assignment.select(col("v"), col("community")).ckpt)
      val q = t("modularity")(Quality.modularity(canon, assign))
      val qS = t("modularity-sing")(Quality.modularity(canon,
        assign.select(col("v"), col("v").as("community"))))
      val n = t("final-count")(
        res.assignment.withColumn("quality_ok", lit(q > qS && q >= 0.05))
          .count())
      System.err.println(s"[probe] rows=$n q=$q qS=$qS")
    }
    spark.stop()
  }
}
