package graft

import graft.algo._

/** Golden micro-graphs ported from the reference integration tests
  * (FIXTURES.md section 3). Behavioral expectations, exact component ids,
  * exact triangle counts, determinism.
  */
class GoldenGraphsSpec extends SparkSpecBase {

  // tests/integration/test_connected_graph_not_all_singletons.rs:5-33
  def twoTriangles = edges(
    (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
    (3L, 4L, 1.0), (4L, 5L, 1.0), (5L, 3L, 1.0),
    (2L, 3L, 0.05))

  test("leiden: two triangles with weak bridge -> two communities") {
    val r = Leiden.run(twoTriangles)
    val part = canonicalPartition(toMapLL(r.assignment))
    assert(part.size == 6)
    // not all singletons (the reference's behavioral golden)
    assert(part.values.toSet.size < 6)
    // expected exact structure: {0,1,2} and {3,4,5}
    assert(part == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 3L))
    assert(r.modularity > 0.3) // strong structure => high modularity
  }

  test("leiden: deterministic replay identity (two-pairs)") {
    // tests/integration/test_deterministic_identity.rs:4-14
    val g = edges((0L, 1L, 1.0), (2L, 3L, 1.0))
    val a = canonicalPartition(toMapLL(Leiden.run(g).assignment))
    val b = canonicalPartition(toMapLL(Leiden.run(g).assignment))
    assert(a == b)
    assert(a == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("leiden: single edge merges (throughput equivalence graph)") {
    // tests/integration/test_throughput_equivalence.rs:4-17
    val g = edges((0L, 1L, 1.0))
    val r = Leiden.run(g)
    val part = canonicalPartition(toMapLL(r.assignment))
    assert(part == Map(0L -> 0L, 1L -> 0L))
  }

  test("leiden: three-chain contract test passes invariants") {
    // tests/contract/test_run_validate.rs:4-14 — every vertex exactly one
    // community, ids are member ids
    val g = edges((0L, 1L, 1.0), (1L, 2L, 1.0))
    val r = Leiden.run(g)
    val rows = r.assignment.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
  }

  test("leiden: empty graph") {
    val g = edges()
    val r = Leiden.run(g)
    assert(r.assignment.count() == 0)
    assert(r.modularity == 0.0)
  }

  test("cc: exact components on golden graphs") {
    val r = ConnectedComponents.run(twoTriangles)
    assert(toMapLL(r.components) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
    val r2 = ConnectedComponents.run(edges((0L, 1L, 1.0), (2L, 3L, 1.0)))
    assert(toMapLL(r2.components) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("cc: isolated vertices via explicit universe") {
    val s = spark
    import s.implicits._
    val verts = Seq(0L, 1L, 2L, 9L).toDF("v")
    val r = ConnectedComponents.run(edges((0L, 1L, 1.0)),
      vertices = Some(verts))
    assert(toMapLL(r.components) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 9L -> 9L))
  }

  test("triangles: exact counts on golden graphs") {
    assert(TriangleCount.total(twoTriangles) == 2L)
    assert(TriangleCount.total(edges((0L, 1L, 1.0), (1L, 2L, 1.0))) == 0L)
    val perV = toMapLL(TriangleCount.perVertex(twoTriangles))
    assert(perV == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L))
    // K4 has 4 triangles, each vertex in 3
    val k4 = edges((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0),
      (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    assert(TriangleCount.total(k4) == 4L)
    assert(toMapLL(TriangleCount.perVertex(k4)).values.toSet == Set(3L))
  }

  test("lpa: stabilizes on two triangles, communities match structure") {
    val r = LabelPropagation.run(twoTriangles, maxIter = 20)
    val labels = canonicalPartition(toMapLL(r.labels))
    // both triangles collapse to one label each
    assert(labels(0L) == labels(1L) && labels(1L) == labels(2L))
    assert(labels(3L) == labels(4L) && labels(4L) == labels(5L))
  }

  test("pagerank: uniform on a ring, sums to 1") {
    val ring = edges((0L until 10L).map(i => (i, (i + 1) % 10, 1.0)): _*)
    val r = PageRank.run(ring, numIter = 30, tol = 1e-12)
    val ranks = toMapLD(r.ranks)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // symmetry: every vertex identical
    assert(ranks.values.forall(v => math.abs(v - 0.1) < 1e-9))
  }

  test("pagerank: matches sequential power-iteration oracle to 1e-6") {
    val g = twoTriangles
    val r = PageRank.run(g, damping = 0.85, numIter = 40)
    val got = toMapLD(r.ranks)
    val want = Oracles.pagerank(
      Seq((0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 4, 1.0), (4, 5, 1.0),
        (5, 3, 1.0), (2, 3, 0.05)), n = 6, damping = 0.85, iters = 40)
    for (v <- 0 until 6)
      assert(math.abs(got(v.toLong) - want(v)) < 1e-6,
        s"v=$v got=${got(v.toLong)} want=${want(v)}")
  }

  test("pagerank: dangling/isolated vertices handled") {
    val s = spark
    import s.implicits._
    val verts = Seq(0L, 1L, 2L).toDF("v")
    val r = PageRank.run(edges((0L, 1L, 1.0)), vertices = Some(verts),
      numIter = 30)
    val ranks = toMapLD(r.ranks)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    assert(ranks(2L) > 0.0)
  }
}

/** Sequential oracles run on the driver — the test-side stand-in for the
  * reference's deterministic mode (SURVEY.md section 5 item 1). */
object Oracles {
  /** Undirected weighted PageRank power iteration with uniform dangling
    * redistribution, same semantics as [[graft.algo.PageRank]]. */
  def pagerank(es: Seq[(Int, Int, Double)], n: Int, damping: Double,
      iters: Int): Array[Double] = {
    val adj = Array.fill(n)(List.empty[(Int, Double)])
    for ((u, v, w) <- es) {
      adj(u) = (v, w) :: adj(u)
      adj(v) = (u, w) :: adj(v)
    }
    val wdeg = adj.map(_.map(_._2).sum)
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 0 until iters) {
      val next = Array.fill(n)((1.0 - damping) / n)
      var dangling = 0.0
      for (u <- 0 until n) {
        if (wdeg(u) == 0.0) dangling += r(u)
        else for ((v, w) <- adj(u)) next(v) += damping * r(u) * w / wdeg(u)
      }
      for (v <- 0 until n) next(v) += damping * dangling / n
      r = next
    }
    r
  }

  /** Exact modularity for small graphs. */
  def modularity(es: Seq[(Int, Int, Double)], comm: Map[Int, Int],
      gamma: Double = 1.0): Double = {
    val m = es.map(_._3).sum
    val wIn = es.filter { case (u, v, _) => comm(u) == comm(v) }
      .map(_._3).sum
    val deg = scala.collection.mutable.Map.empty[Int, Double]
      .withDefaultValue(0.0)
    for ((u, v, w) <- es) { deg(u) += w; deg(v) += w }
    val cdeg = deg.groupBy { case (v, _) => comm(v) }
      .map { case (c, kv) => c -> kv.values.sum }
    wIn / m - gamma * cdeg.values.map(d => d * d).sum / (4 * m * m)
  }
}
