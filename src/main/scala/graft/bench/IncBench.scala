package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{Incremental, Quality}
import graft.source.CodeTableSynth

/** Incremental benchmark runner — the analog of the reference's
  * run_incremental (/root/reference/src/benchmark/
  * hit_leiden_incremental.rs:7-103): paper_split the edge set
  * (initial 80%, then cumulative batches), per batch run the warm-start
  * HIT update vs a cold full recompute (the "ST baseline"), record
  * wall-clock, speedup and quality delta. Emits one JSON line.
  *
  * Note the reference's own bench re-runs from identity state each batch
  * (SURVEY.md section 3.2); ours exercises true warm-start, which is the
  * engine's actual contract.
  */
object IncBench {

  /** One measured batch: warm HIT update vs cold full recompute. */
  final case class BatchRow(batch: Int, warmSec: Double, coldSec: Double,
      speedup: Double, qWarm: Double, qCold: Double)

  final case class Summary(initialSec: Double, edges: Long, batchSize: Int,
      rounds: Int, rows: Seq[BatchRow]) {
    def avgSpeedup: Double =
      if (rows.isEmpty) 0.0 else rows.map(_.speedup).sum / rows.size
    /** Compact per-run JSON fragment (no surrounding key). */
    def json: String = {
      val batchJson = rows.map { r =>
        s"""{"batch":${r.batch},"warm_sec":${r.warmSec},""" +
          s""""cold_sec":${r.coldSec},"speedup":${r.speedup},""" +
          s""""q_warm":${r.qWarm},"q_cold":${r.qCold}}"""
      }.mkString("[", ",", "]")
      s"""{"initial_sec":$initialSec,"edges":$edges,""" +
        s""""batch_size":$batchSize,"rounds":$rounds,""" +
        s""""avg_speedup":$avgSpeedup,"batches":$batchJson}"""
    }
  }

  /** Run the warm-vs-cold incremental bench on a deterministic SBM graph.
    * Callable both from the standalone main and from `graft.Bench` (which
    * folds the summary into the gate artifact). */
  def runBench(spark: SparkSession, n: Long, batchSize: Int, rounds: Int,
      doCold: Boolean): Summary = {
    val edges = CodeTableSynth.sbmEdges(spark, n, nBlocks = 32,
      degIntra = 6, degInter = 1).localCheckpoint(true)
    val (init, batches) = Incremental.paperSplit(edges, 0.8, batchSize,
      rounds)
    // A/B diagnostics: SPARK_GRAFT_INC_HIER=0 pins the re-solve path
    val cfg = graft.algo.Leiden.Config(incrementalHierarchy =
      !sys.env.get("SPARK_GRAFT_INC_HIER").contains("0"))

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // VERDICT r5 #5 diagnosability: with GRAFT_DEBUG_TIMING the cold
    // initial emits its per-phase iteration metrics too, so a swing in
    // initial_sec can be attributed to a phase instead of guessed at
    val debug0 = sys.env.get("GRAFT_DEBUG_TIMING").contains("1")
    val initSink =
      if (debug0) new graft.run.MetricsSink else graft.run.MetricsSink.discard
    val (state0, tInit) = secs(Incremental.initial(init, cfg,
      sink = initSink))
    if (debug0) initSink.all.foreach { it =>
      System.err.println(f"[init] ${it.algo}%-18s lvl=${it.level} " +
        f"i=${it.iteration} moves=${it.movesAccepted} " +
        f"frontier=${it.frontier} ${it.seconds}%.2fs")
    }
    var state = state0
    var cumulative = init
    val rows = batches.zipWithIndex.map { case (b, i) =>
      cumulative = cumulative.unionAll(b).localCheckpoint(true)
      val debugT = sys.env.get("GRAFT_DEBUG_TIMING").contains("1")
      val sink =
        if (debugT) new graft.run.MetricsSink else graft.run.MetricsSink.discard
      val (next, tWarm) = secs {
        val s = Incremental.update(state, b, cfg, sink = sink)
        s.assign.count(); s
      }
      if (debugT) sink.all.foreach { it =>
        System.err.println(f"[it] ${it.algo}%-18s lvl=${it.level} " +
          f"i=${it.iteration} moves=${it.movesAccepted} " +
          f"frontier=${it.frontier} ${it.seconds}%.2fs")
      }
      state = next
      val (cold, tCold) =
        if (doCold) secs {
          val s = Incremental.initial(cumulative, cfg); s.assign.count(); s
        } else (null, 0.0)
      val qWarm = Quality.modularity(state.canon,
        state.assign.select(col("v"), col("community")))
      val qCold = if (doCold) Quality.modularity(cold.canon,
        cold.assign.select(col("v"), col("community"))) else 0.0
      BatchRow(i, tWarm, tCold, if (doCold) tCold / tWarm else 0.0,
        qWarm, qCold)
    }
    Summary(tInit, edges.count(), batchSize, rounds, rows)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_INC_N", "50000").toLong
    val batchSize = sys.env.getOrElse("SPARK_GRAFT_INC_BATCH", "1000").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_INC_ROUNDS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.defaultSizeInBytes", (128L << 20).toString)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_INC_COLD=0 skips the cold-recompute baseline (fast
    // iteration on the warm path; speedup reads 0)
    val doCold = !sys.env.get("SPARK_GRAFT_INC_COLD").contains("0")
    val s = runBench(spark, n, batchSize, rounds, doCold)
    println(s"""{"metric":"incremental",""" + s.json.drop(1))
    spark.stop()
  }
}
