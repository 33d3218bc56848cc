package graft

import org.apache.spark.sql.functions._
import graft.algo.{Incremental, Leiden}
import graft.graph.{BucketedEdges, EdgeOps}

/** Round-5 hardening: crash-safety of the durable BucketedEdges merge
  * (idempotent replay via recorded batch ids, committed-merge roll-
  * forward, uncommitted-staging roll-back) and the exact-degree movement
  * broadcast gate's fallback.
  */
class DurabilityCrashSpec extends SparkSpecBase {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def sbm(n: Long): org.apache.spark.sql.DataFrame =
    graft.source.CodeTableSynth.sbmEdges(spark, n, nBlocks = 4,
      degIntra = 4, degInter = 1)

  private def canonMap(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("durable replay: a batch already recorded in the store is not " +
      "double-applied (crash between merge and checkpoint commit)") {
    val g = sbm(300)
    val (init, batches) = Incremental.paperSplit(g, 0.8, 40, 1)
    val store = tmpDir("replay") + "/canon"
    val dur0 = Incremental.initial(init,
      durable = Some(Incremental.DurableCanon(store, nBuckets = 8)))
    val b = batches.head

    // the normal (no-crash) outcome of batch 1
    val expected = Incremental.update(dur0, b, batchId = Some(1L))
    val expectedCanon = canonMap(BucketedEdges.read(spark, store))

    // simulate the crash window: the store has batch 1 merged (and its
    // applied_1 marker) but the checkpointed assignment is still dur0's.
    // Engine.readState would then hand update() a state whose canon/m2
    // come from the AHEAD store:
    val aheadCanon = BucketedEdges.read(spark, store)
    val replayState = Incremental.State(aheadCanon, dur0.assign,
      2.0 * EdgeOps.totalWeight(aheadCanon),
      durable = Some(Incremental.DurableCanon(store, nBuckets = 8)))
    val replayed = Incremental.update(replayState, b, batchId = Some(1L))

    // store content unchanged (merge skipped), result identical
    assert(canonMap(BucketedEdges.read(spark, store)) == expectedCanon,
      "replay mutated the store — weights double-applied")
    assert(math.abs(replayed.m2 - expected.m2) < 1e-9,
      s"m2 diverged: ${replayed.m2} vs ${expected.m2}")
    assert(canonMap(replayed.canon) == expectedCanon)
    val a = canonicalPartition(
      toMapLL(expected.assign.select(col("v"), col("community"))))
    val c = canonicalPartition(
      toMapLL(replayed.assign.select(col("v"), col("community"))))
    assert(a == c, "replayed batch diverged from the committed outcome")
  }

  test("recover: committed-but-unswapped staging rolls FORWARD " +
      "(bucket replaced, batch id recorded, staging cleared)") {
    val store = tmpDir("rollfwd") + "/canon"
    val g = edges((0L, 1L, 1.0), (2L, 3L, 1.0), (4L, 5L, 1.0))
    BucketedEdges.write(EdgeOps.compress(g), store, nBuckets = 4)
    // bucket of each edge (the staged dir replaces its WHOLE bucket, so
    // the assertions below depend on who shares a bucket with (0,1))
    def bucketOf(s: Long, d: Long): Long = spark.range(1)
      .select(pmod(xxhash64(lit(s), lit(d)), lit(4)).as("b"))
      .head.getLong(0)
    val b01 = bucketOf(0L, 1L)
    // hand-craft a crash state: staged replacement for that bucket with a
    // bumped weight, plus an atomic COMMIT record — as if the process
    // died after COMMIT but before the swap
    edges((0L, 1L, 9.0)).write
      .parquet(s"$store/_staging/data/bucket=$b01")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/_staging/COMMIT"),
      s"""{"batch":7,"touched":[$b01],"surviving":[$b01]}""")

    BucketedEdges.recover(spark, store)

    val m = canonMap(BucketedEdges.read(spark, store))
    assert(m((0L, 1L)) == 9.0, s"staged bucket not swapped in: $m")
    // edges in OTHER buckets must survive; an edge sharing (0,1)'s
    // bucket is legitimately replaced by the staged (authoritative
    // full-bucket) content
    Seq((2L, 3L), (4L, 5L)).foreach { case (s, d) =>
      if (bucketOf(s, d) != b01)
        assert(m((s, d)) == 1.0,
          s"untouched bucket lost ($s,$d) in recovery: $m")
      else assert(!m.contains((s, d)),
        s"($s,$d) shares bucket $b01 and must have been replaced")
    }
    assert(BucketedEdges.lastApplied(spark, store).contains(7L))
    assert(!new java.io.File(s"$store/_staging").exists())
    // recover is idempotent
    BucketedEdges.recover(spark, store)
    assert(canonMap(BucketedEdges.read(spark, store)) == m)
  }

  test("recover: uncommitted staging rolls BACK (live table untouched)") {
    val store = tmpDir("rollback") + "/canon"
    val g = edges((0L, 1L, 1.0), (2L, 3L, 1.0))
    BucketedEdges.write(EdgeOps.compress(g), store, nBuckets = 4)
    val before = canonMap(BucketedEdges.read(spark, store))
    edges((0L, 1L, 9.0)).write
      .parquet(s"$store/_staging/data/bucket=0") // no COMMIT record
    BucketedEdges.recover(spark, store)
    assert(canonMap(BucketedEdges.read(spark, store)) == before)
    assert(!new java.io.File(s"$store/_staging").exists())
    assert(BucketedEdges.lastApplied(spark, store).isEmpty)
  }

  test("movement: hub frontier exceeding the broadcast budget falls " +
      "back to the shuffle gather with identical moves") {
    // star hub (deg 40) in a 2-vertex frontier: the old
    // frontierN * avgDeg estimate reads ~2 * 1.95 rows, but the true
    // frontier degree sum is 41 — the exact gate must catch it
    val star = (1L to 40L).map(i => (0L, i, 1.0)) :+ (41L, 42L, 1.0)
    val canon = EdgeOps.compress(edges(star: _*)).localCheckpoint(true)
    val adj = EdgeOps.symmetrize(canon).localCheckpoint(true)
    val deg = EdgeOps.degrees(adj).localCheckpoint(true)
    val m2 = 2.0 * EdgeOps.totalWeight(canon)
    val s = spark
    import s.implicits._
    val assign = (0L to 42L).map(v => (v, v, v))
      .toDF("v", "community", "subcomm")
    val active = Seq(0L, 41L).toDF("v")
    def run() = toMapLL(Leiden.movement(adj, deg, m2, assign, active,
      Leiden.Config(), graft.run.MetricsSink.discard, level = 0)
      .assign.select("v", "community"))
    val viaBroadcast = run()
    val viaShuffle =
      try {
        // 64-byte budget: frontierDegSum(41) * 32B blows it, so the
        // small-gather broadcast plan must be refused
        sys.props("graft.bcast.budgetBytes") = "64"
        run()
      } finally sys.props -= "graft.bcast.budgetBytes"
    assert(viaBroadcast == viaShuffle,
      "budget-refused gather path changed the movement result")
    // sanity: movement actually did something on this graph
    assert(viaShuffle.nonEmpty)
  }
}
