package graft.bench

import graft.util.Ckpt.DFCkpt
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps

/** Prints formatted physical plans for the load-bearing query shapes so
  * plan properties (column pruning, filter pushdown, exchange reuse,
  * whole-stage codegen spans) can be audited — see PLANS.md for the
  * captured output + commentary. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def section(name: String)(planOf: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      println(planOf.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    // 1. column pruning + predicate pushdown on the parquet scan
    section("scan: projection+filter pushdown (documents)") {
      spark.read.parquet(s"$dir/documents.parquet")
        .where(col("lang") === "en")
        .select(col("doc_id"), length(col("text")).as("n"))
    }

    // 2. degree query: derived graph -> compress -> symmetrize -> agg
    section("q_degree full pipeline") {
      graft.queries.Queries.qDegree(spark, dir)
    }

    // 3. iterative superstep join: static side checkpointed+pre-partitioned
    //    -> the per-iteration plan must NOT re-shuffle it
    section("pagerank superstep (static side partitioning reuse)") {
      val edges = graft.queries.Queries.lineitemGraph(spark, dir)
      val canon = EdgeOps.compress(edges)
      val adj = EdgeOps.symmetrize(canon)
      val wdeg = EdgeOps.degrees(adj)
      val shares = adj.join(wdeg, adj("src") === wdeg("v"))
        .select(col("src"), col("dst"),
          (col("weight") / col("deg")).as("share"))
        .repartition(4, col("src"))
        .ckpt
      val ranks = EdgeOps.vertices(canon).withColumn("rank", lit(0.1)).ckpt
      shares.join(ranks.hint("shuffle_hash"), shares("src") === ranks("v"))
        .select(col("dst").as("v"), (col("share") * col("rank")).as("c"))
        .groupBy("v").agg(sum("c").as("mass"))
    }

    // 4. triangle wedge join: the small oriented table must BROADCAST
    //    (ckpt drops stats, so this is an explicit gate — round-2 bug)
    section("triangle count wedge join (broadcast both closing sides)") {
      graft.queries.Queries.qTrianglesPerVertex(spark, dir)
    }

    // 5. embedding near-dup pair scoring: norms once per row in the
    //    projections, per-pair dot fully inside WholeStageCodegen
    section("embedding near-dup exact (carried norms, unrolled dot)") {
      graft.queries.Queries.qEmbDedup(spark, dir)
    }

    // 6. LPA gather: label table broadcast for small vertex sets -> the
    //    adjacency streams map-side, no per-round shuffle of either table
    //    (one explicit round; the run() loop consumes the same shape)
    section("label propagation round (broadcast gather)") {
      val edges = graft.queries.Queries.lineitemGraph(spark, dir)
      val canon = EdgeOps.compress(edges).where(col("src") =!= col("dst"))
        .ckpt
      val adj = EdgeOps.symmetrize(canon).ckpt
      val labels = EdgeOps.vertices(canon).withColumn("label", col("v")).ckpt
      val byDst = labels.select(col("v").as("dst"), col("label"))
      adj.join(broadcast(byDst), "dst")
        .groupBy(col("src").as("v"), col("label"))
        .agg(sum(col("weight")).as("w"))
        .groupBy("v")
        .agg(max_by(col("label"), struct(col("w"), negate(col("label"))))
          .as("newLabel"))
    }
    spark.stop()
  }
}
