package graft

import graft.algo.{Leiden, Quality}
import graft.source.CodeTableSynth

/** CPM quality function and explicit hot-key salting. */
class CpmSaltSpec extends SparkSpecBase {

  def twoTriangles = edges(
    (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
    (3L, 4L, 1.0), (4L, 5L, 1.0), (5L, 3L, 1.0),
    (2L, 3L, 0.05))

  test("cpm: two triangles stay separate, quality matches closed form") {
    val r = Leiden.run(twoTriangles, Leiden.Config(gamma = 0.1,
      useCpm = true))
    val part = canonicalPartition(toMapLL(r.assignment))
    assert(part == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 3L), s"part=$part")
    // Q_cpm = W_in - gamma * sum n(n-1)/2 = 6.0 - 0.1 * (3 + 3) = 5.4
    assert(math.abs(r.modularity - 5.4) < 1e-9, s"q=${r.modularity}")
  }

  test("cpm: high gamma forces singletons") {
    // merging any pair costs gamma*1 > max edge weight 1.0
    val r = Leiden.run(twoTriangles, Leiden.Config(gamma = 2.0,
      useCpm = true))
    assert(r.communityCount == 6)
  }

  test("cpm quality function matches brute oracle on a partition") {
    val s = spark
    import s.implicits._
    val canon = graft.graph.EdgeOps.compress(twoTriangles)
    val assign = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L),
      (5L, 3L)).toDF("v", "community")
    // W_in = 6.0; pairs = 3 + 3; gamma = 0.5 -> 6.0 - 3.0 = 3.0
    assert(math.abs(Quality.cpm(canon, assign, 0.5) - 3.0) < 1e-9)
  }

  test("salted gather produces the identical partition on a hub graph") {
    val edges = CodeTableSynth.sbmEdges(spark, 600, nBlocks = 6,
      degIntra = 6, degInter = 1, hubFraction = 0.02, hubFactor = 30)
      .localCheckpoint(true)
    val plain = Leiden.run(edges, Leiden.Config(maxSweeps = 15))
    val salted = Leiden.run(edges, Leiden.Config(maxSweeps = 15,
      saltFactor = 4, hotDegree = 50.0))
    val a = canonicalPartition(toMapLL(plain.assignment))
    val b = canonicalPartition(toMapLL(salted.assignment))
    assert(a == b)
    assert(math.abs(plain.modularity - salted.modularity) < 1e-9)
  }
}
