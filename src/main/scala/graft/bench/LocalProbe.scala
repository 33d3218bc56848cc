package graft.bench

import graft.algo.{Leiden, LocalLeiden}

/** Pure-JVM diagnostic for the sequential solver: synthesize an SBM-ish
  * edge array and time LocalLeiden.solve phases (no Spark session). */
object LocalProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N", "300000").toInt
    val degAvg = sys.env.getOrElse("DEG", "8").toInt
    val blocks = 64
    val rnd = new scala.util.Random(42)
    val bsz = n / blocks
    val es = Array.newBuilder[(Long, Long, Double)]
    var i = 0
    while (i < n.toLong * degAvg / 2) {
      val u = rnd.nextInt(n)
      val v = if (rnd.nextInt(10) < 8) {
        val b = u / bsz
        math.min(n - 1, b * bsz + rnd.nextInt(bsz))
      } else rnd.nextInt(n)
      if (u != v) es += ((u.toLong, v.toLong, 1.0 + rnd.nextInt(3)))
      i += 1
    }
    val edges = es.result()
    println(s"LPROBE edges=${edges.length} verts~$n")
    var t0 = System.nanoTime()
    val r = LocalLeiden.solve(edges, Map.empty, Map.empty, Leiden.Config())
    println(f"LPROBE solve=${(System.nanoTime() - t0) / 1e9}%.1fs " +
      s"communities=${r.values.toSet.size}")
    t0 = System.nanoTime()
    LocalLeiden.solve(edges, Map.empty, Map.empty, Leiden.Config())
    println(f"LPROBE solve2=${(System.nanoTime() - t0) / 1e9}%.1fs")
  }
}
