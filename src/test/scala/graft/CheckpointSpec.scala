package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.state.Checkpointer
import graft.run.IterMetric

/** Durable checkpoint contract: write -> LATEST -> resume identical
  * (north rule: resumable from per-iteration Parquet checkpoints with
  * lineage + metrics). */
class CheckpointSpec extends SparkSpecBase {

  test("write/latest/read roundtrip with manifest and metrics") {
    val root = Files.createTempDirectory("graft-ckpt").toString
    val cp = new Checkpointer(root, "run1")
    assert(cp.latest().isEmpty)

    val s = spark
    import s.implicits._
    val assign0 = Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("v", "community")
    cp.write(0, assign0, Seq(IterMetric("leiden.movement", 0, 0, 10, 2, 3,
      0.1, 0.5)), frontier = 3, quality = 0.1)
    val assign1 = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("v", "community")
    cp.write(1, assign1, Seq(IterMetric("leiden.movement", 0, 1, 5, 1, 1,
      0.05, 0.3)), frontier = 1, quality = 0.15)

    assert(cp.latest().contains(1))
    val resumed = cp.readAssignment(spark, 1)
    assert(toMapLL(resumed.select("v", "community")) ==
      Map(1L -> 10L, 2L -> 10L, 3L -> 10L))
    val manifest = cp.readManifest(1)
    assert(manifest.contains("\"iter\":1") && manifest.contains("\"rows\":3"))
    // metrics parquet carries run lineage columns
    val m = spark.read.parquet(s"$root/run1/iter=1/metrics")
    assert(m.columns.contains("run_id") && m.columns.contains("iter"))
    assert(m.count() == 1)
  }

  test("uncommitted iteration (no manifest) is not visible as latest") {
    val root = Files.createTempDirectory("graft-ckpt2").toString
    val cp = new Checkpointer(root, "run2")
    val s = spark
    import s.implicits._
    cp.write(0, Seq((1L, 1L)).toDF("v", "community"), Nil, 1, 0.0)
    // simulate a crash between parquet write and manifest commit
    Files.delete(java.nio.file.Paths.get(s"$root/run2/iter=0/MANIFEST.json"))
    assert(cp.latest().isEmpty)
  }
}
