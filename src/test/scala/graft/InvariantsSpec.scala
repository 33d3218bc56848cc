package graft

import scala.util.Random
import graft.algo._

/** Property-style invariants over seeded random graphs, checked against
  * brute-force sequential oracles (SURVEY.md section 5 item 2). Seeds are
  * fixed so failures reproduce.
  */
class InvariantsSpec extends SparkSpecBase {

  /** Deterministic random graph: n vertices, ~m candidate edges. */
  def randomGraph(seed: Int, n: Int, m: Int): Seq[(Long, Long, Double)] = {
    val rnd = new Random(seed)
    (0 until m).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        1.0 + rnd.nextInt(3))
    }.filter { case (u, v, _) => u != v }
  }

  def bruteComponents(n: Int, es: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else {
      parent(x) = find(parent(x)); parent(x)
    }
    for ((u, v, _) <- es) {
      val (ru, rv) = (find(u.toInt), find(v.toInt))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> {
      // min member of the component
      verts.filter(w => find(w.toInt) == find(v.toInt)).min
    }).toMap
  }

  def bruteTriangles(es: Seq[(Long, Long, Double)]): Long = {
    val simple = es.map { case (u, v, _) =>
      (math.min(u, v), math.max(u, v))
    }.distinct.toSet
    val verts = simple.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var count = 0L
    for {
      i <- verts.indices; j <- (i + 1) until verts.size
      if simple((verts(i), verts(j)))
      k <- (j + 1) until verts.size
      if simple((verts(j), verts(k))) && simple((verts(i), verts(k)))
    } count += 1
    count
  }

  val seeds = Seq(1, 7, 42)

  test("cc matches union-find oracle on random graphs") {
    for (s <- seeds) {
      val es = randomGraph(s, 25, 40)
      val got = toMapLL(ConnectedComponents.run(edges(es: _*)).components)
      assert(got == bruteComponents(25, es), s"seed=$s")
    }
  }

  test("triangle count matches brute force on random graphs") {
    for (s <- seeds) {
      val es = randomGraph(s, 20, 50)
      assert(TriangleCount.total(edges(es: _*)) == bruteTriangles(es),
        s"seed=$s")
    }
  }

  test("pagerank sums to 1 and matches sequential oracle (1e-6)") {
    val s0 = spark
    import s0.implicits._
    for (s <- seeds.take(2)) {
      val es = randomGraph(s, 20, 35)
      val n = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
      // same vertex universe 0..n-1 as the oracle (isolated = dangling)
      val verts = (0L until n.toLong).toDF("v")
      val got = toMapLD(PageRank.run(edges(es: _*),
        vertices = Some(verts), numIter = 30).ranks)
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"seed=$s sum")
      val esInt = es.map { case (u, v, w) => (u.toInt, v.toInt, w) }
      val oracle = Oracles.pagerank(esInt, n, 0.85, 30)
      for ((v, r) <- got)
        assert(math.abs(r - oracle(v.toInt)) < 1e-6, s"seed=$s v=$v")
    }
  }

  test("leiden invariants: total partition, member-id communities, " +
    "quality >= singleton quality") {
    for (s <- seeds.take(2)) {
      val es = randomGraph(s, 24, 45)
      val g = edges(es: _*)
      val r = Leiden.run(g)
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.toSet
      val assignMap = toMapLL(r.assignment)
      // exactly one community per vertex (A15 invariants)
      assert(assignMap.keySet == verts, s"seed=$s coverage")
      // community ids are member vertex ids
      assert(r.assignment.select("community").distinct().collect()
        .map(_.getLong(0)).toSet.subsetOf(verts), s"seed=$s ids")
      // quality no worse than the all-singleton partition
      val esInt = es.map { case (u, v, w) => (u.toInt, v.toInt, w) }
      val merged = esInt.groupBy { case (u, v, _) =>
        (math.min(u, v), math.max(u, v))
      }.map { case ((u, v), g) => (u, v, g.map(_._3).sum) }.toSeq
      val singletonQ = Oracles.modularity(merged,
        verts.map(v => v.toInt -> v.toInt).toMap)
      assert(r.modularity >= singletonQ - 1e-9, s"seed=$s quality")
      // modularity score itself matches the sequential oracle
      val oq = Oracles.modularity(merged,
        assignMap.map { case (v, c) => v.toInt -> c.toInt })
      assert(math.abs(r.modularity - oq) < 1e-6, s"seed=$s score")
    }
  }

  test("lpa terminates and labels are member ids") {
    for (s <- seeds.take(2)) {
      val es = randomGraph(s, 20, 35)
      val r = LabelPropagation.run(edges(es: _*), maxIter = 15)
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.toSet
      val labels = toMapLL(r.labels)
      assert(labels.keySet == verts)
      assert(labels.values.toSet.subsetOf(verts))
    }
  }

  test("determinism: identical results across repeated runs") {
    val es = randomGraph(42, 24, 45)
    val g = edges(es: _*)
    // Leiden: EXACT equality is guaranteed — every sum it compares is
    // over integer-valued weights (exact in double, order-independent)
    val a = canonicalPartition(toMapLL(Leiden.run(g).assignment))
    val b = canonicalPartition(toMapLL(Leiden.run(g).assignment))
    assert(a == b)
    // PageRank ranks are true fractions: per-vertex sums merge partial
    // aggregates in shuffle-fetch ARRIVAL order, which Spark does not
    // pin, so bit-identity is not guaranteed (the r5 full-suite flake:
    // block eviction changed recomputation order). Assert allclose at
    // 1e-12 — far below any rounding the callers apply (4 dp), honest
    // about what the engine promises.
    val p1 = toMapLD(PageRank.run(g, numIter = 10).ranks)
    val p2 = toMapLD(PageRank.run(g, numIter = 10).ranks)
    assert(p1.keySet == p2.keySet)
    for ((v, r) <- p1)
      assert(math.abs(r - p2(v)) < 1e-12, s"v=$v $r vs ${p2(v)}")
  }
}
