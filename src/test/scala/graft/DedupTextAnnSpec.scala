package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps
import graft.ann.Ann

/** Training-data pipeline operators: dedup (exact/MinHash/SimHash/
  * Jaccard), text analysis, similarity search — exact small-case oracles.
  */
class DedupTextAnnSpec extends SparkSpecBase {

  def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val d = docs((1L, "aa bb"), (2L, "aa bb"), (3L, "cc"))
    val r = Dedup.exact(d).collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(r.toSet == Set((2L, 1L), (1L, 3L)))
  }

  test("jaccard: exact unigram similarity") {
    val d = docs((1L, "a b c d"), (2L, "a b c e"), (3L, "x y"))
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.jaccardForPairs(d, pairs, w = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 0.6) // |{a,b,c}| / |{a,b,c,d,e}| = 3/5
    assert(got((1L, 3L)) == 0.0)
  }

  test("minhash LSH: near-identical docs become candidates, disjoint don't") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, base),
      (2L, base + " tail"), // high overlap
      (3L, "completely different words entirely unrelated content here now"))
    val pairs = Dedup.minhashLshPairs(d, numHashes = 32, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) > 0.5)
    assert(!pairs.contains((1L, 3L)) || pairs((1L, 3L)) < 0.2)
  }

  test("simhash: identical docs at hamming 0, near pairs found") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "qq ww ee rr tt yy uu ii oo pp"))
    val near = Dedup.simhashNearPairs(d, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2).toLong))
      .toMap
    assert(near((1L, 2L)) == 0L)
    assert(!near.contains((1L, 3L)))
  }

  test("simhash pigeonhole: 100% recall at every distance <= maxHamming") {
    // plant hash pairs at EVERY distance 0..maxHamming, with the flipped
    // bits spread maximally (the round-1 bug: 4 fixed 16-bit pieces missed
    // pairs at distance 4..8 that differ in all four pieces)
    val s = spark
    import s.implicits._
    val maxH = 8
    val baseHash = 0x0123456789ABCDEFL
    // pair k: id (2k, 2k+1); second hash flips k bits at positions 0, 8,
    // 16, 24, ... (stride 8 spreads them across pieces)
    val rows = (0 to maxH).flatMap { k =>
      val flipped = (0 until k).foldLeft(baseHash + 1024L * k)(
        (h, i) => h ^ (1L << (i * 8)))
      Seq((2L * k, baseHash + 1024L * k), (2L * k + 1, flipped))
    }
    val sh = rows.toDF("id", "simhash")
    val near = graft.dedup.Dedup.nearPairsFromHashes(sh, maxH)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    (0 to maxH).foreach { k =>
      assert(near.get((2L * k, 2L * k + 1)).contains(k),
        s"pair at hamming $k missed: $near")
    }
  }

  test("text ops: token counts, quality, langid, fingerprint determinism") {
    val d = docs((1L, "the cat sat on the mat"),
      (2L, "der hund und die katze"), (3L, "zz"))
    val r = d.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("tok"),
      TextOps.languageId(col("text")).as("lang"),
      TextOps.qualityScore(col("text")).as("q")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2), x.getDouble(3)))
      .toMap
    assert(r(1L)._1 == 6 && r(1L)._2 == "en")
    assert(r(2L)._2 == "de")
    assert(r(3L)._2 == "und")
    assert(r(1L)._3 > r(3L)._3) // real sentence scores above junk
    // fingerprint is a pure function: same text -> same fp
    val fp = d.select(TextOps.shingleFingerprint(col("text")).as("fp"))
      .collect().map(_.getStruct(0))
    val fp2 = d.repartition(3)
      .select(TextOps.shingleFingerprint(col("text")).as("fp"))
      .collect().map(_.getStruct(0))
    assert(fp.map(_.toString).sorted.sameElements(fp2.map(_.toString).sorted))
  }

  test("embedding near-dup: exact finds planted duplicates; LSH recalls them") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // 20 random vectors plus 3 planted near-duplicate pairs
    val base = (0 until 20).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val planted = (0 until 3).map { i =>
      val (_, v) = base(i)
      (100L + i, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    val emb = (base ++ planted).toDF("id", "vec")
    val exact = graft.dedup.Dedup.embeddingNearDupExact(emb, minCos = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 3).foreach { i =>
      assert(exact.contains((i.toLong, 100L + i)), s"missing pair $i: $exact")
    }
    // random 16-dim pairs at cos >= 0.95 are vanishingly unlikely
    assert(exact.size <= 5, s"too many pairs: $exact")
    val lsh = graft.dedup.Dedup.embeddingNearDupLsh(emb, minCos = 0.95,
      dim = 16, planes = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.65, s"lsh recall=$recall")
    assert(lsh.subsetOf(exact)) // verify step never invents pairs
  }

  test("ann: brute-force cosine top-k exact on a known configuration") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "vec")
    val top = Ann.bruteTopK(vecs.where(col("id") === 0), vecs, k = 2)
      .orderBy("rank").collect()
    assert(top(0).getLong(1) == 1L) // closest to e_x is (0.9, 0.1, 0)
    assert(top.length == 2)
    val cos01 = top(0).getDouble(2)
    assert(math.abs(cos01 - 0.9 / math.sqrt(0.82)) < 1e-6)
  }

  test("ann: LSH top-k recalls the exact nearest neighbor on clusters") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // two tight clusters of 20 vectors in R^16
    val mk = (c: Int, j: Int) => Array.tabulate(16)(i =>
      (if (i % 2 == c) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.05f)
    val vecs = (0 until 40).map(j => (j.toLong, mk(j % 2, j))).toDF("id", "vec")
    val exact = Ann.bruteTopK(vecs.where(col("id") < 4), vecs, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(vecs.where(col("id") < 4), vecs, k = 3,
      dim = 16, planes = 8, bands = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same-cluster neighbors collide in buckets: recall >= 2/3 per query
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.65, s"recall=$recall")
  }
}
