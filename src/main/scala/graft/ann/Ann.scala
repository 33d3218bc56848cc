package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (ARRAY<FLOAT>):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path (candidates
  * only meet inside a bucket — the cross join disappears).
  *
  * All vector math is codegen'd higher-order functions
  * (zip_with + aggregate), no UDFs.
  */
object Ann {

  /** dot(a,b) as a column expression (generic, any length). Higher-order
    * functions are interpreted, not codegen'd — prefer [[dotN]] in hot
    * per-pair paths when the dimension is statically known. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d),
      (acc, x) => acc + x)

  /** dot(a,b) unrolled for a statically-known dimension: a foldLeft of
    * element_at products seeded with 0.0 — the EXACT association of
    * [[dot]]'s aggregate ((((0+x0)+x1)+...), so values are bit-identical —
    * but as plain codegen'd scalar expressions instead of an interpreted
    * HigherOrderFunction: ~an order of magnitude cheaper per pair. */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i => element_at(a, i + 1) * element_at(b, i + 1))
      .foldLeft(lit(0.0d))(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normN(a: Column, dim: Int): Column = sqrt(dotN(a, a, dim))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (brute force —
    * the correctness baseline; O(|q|*|corpus|), use only for small |q|).
    * queries/corpus: (id, vec). Output: (query_id, neighbor_id, cos, rank).
    *
    * Norms are computed ONCE per row in the projections and carried into
    * the pair scoring (`dot/(na*nb)` — the same arithmetic as [[cosine]],
    * so values are bit-identical to the oracle's), instead of re-deriving
    * both norms per candidate pair. `dim > 0` additionally switches the
    * per-pair dot to the codegen'd unrolled form.
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 0): DataFrame = {
    // vectors cast to double BEFORE any arithmetic: float-precision
    // products would diverge from a double-computing SQL oracle (and
    // double accumulation is the right numeric choice anyway)
    // dim known -> ONE codegen'd loop per pair (graft.functions
    // .DotProduct); same accumulation order as dotN, bit-identical
    val ss = queries.sparkSession
    def nrm(c: Column) = if (dim > 0)
      sqrt(graft.functions.VectorExprs.dotFast(ss, c, c, dim)) else norm(c)
    def dp(a: Column, b: Column) =
      if (dim > 0) graft.functions.VectorExprs.dotFast(ss, a, b, dim)
      else dot(a, b)
    // broadcast the small QUERY side (the brute-force contract) and
    // spread the corpus — a small parquet corpus otherwise arrives as one
    // partition and the whole O(|q|*|c|) evaluation runs in a single task
    val parts = queries.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.select(col("id").as("query_id"),
      col("vec").cast("array<double>").as("qv"))
      .withColumn("qn", nrm(col("qv")))
    val c = corpus.select(col("id").as("neighbor_id"),
      col("vec").cast("array<double>").as("cv"))
      .withColumn("cn", nrm(col("cv")))
      .repartition(parts)
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dp(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic random-hyperplane signature: `planes` sign bits, plane
    * j's i-th component is +-1 from xxhash64(seed, j, i). Vectors close in
    * cosine share sign bits with high probability.
    *
    * The sign constants are folded driver-side by EVALUATING the same
    * literal xxhash64 expression Catalyst would have constant-folded:
    * identical signature values, but the plan carries dim*planes literal
    * doubles instead of that many when(pmod(xxhash64(...))) subtrees —
    * which the optimizer re-folded on EVERY query at a measured ~1-3 s
    * of pure planning time for 64x16. */
  def rhpSignature(vec: Column, dim: Int, planes: Int,
      seed: Long = 42L): Column = {
    val signs = signTable(dim, planes, seed)
    val bits = (0 until planes).map { j =>
      val s = (0 until dim).map { i =>
        element_at(vec, i + 1).cast("double") * lit(signs(j)(i))
      }.reduce(_ + _)
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** The signature sign table: plane j's i-th component is +-1 from
    * xxhash64(seed, j, i), folded driver-side (see [[rhpSignature]]). */
  private def signTable(dim: Int, planes: Int,
      seed: Long): Array[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    Array.tabulate(planes, dim) { (j, i) =>
      // the exact value of pmod(xxhash64(lit(seed), lit(j), lit(i)), 2):
      // same XxHash64 expression (default seed 42, Long/Int/Int children)
      // evaluated eagerly; pmod on a positive modulus is floorMod
      val h = XxHash64(Seq(Literal(seed), Literal(j), Literal(i)), 42L)
        .eval(null).asInstanceOf[Long]
      if (java.lang.Math.floorMod(h, 2L) == 0L) 1.0d else -1.0d
    }
  }

  /** [[rhpSignature]] as a COMPACT plan: per plane, one interpreted
    * `aggregate(zip_with(vec, <literal sign array>))` instead of `dim`
    * unrolled scalar nodes — ~150 expression nodes total vs ~1000+ for
    * 64x16. Values are bit-identical (the fold runs in the same index
    * order; the extra 0.0 seed cannot change any partial sum except the
    * sign of a zero, which the `> 0` bit test ignores) — pinned by
    * FastPathEquivalenceSpec.
    *
    * Trade-off: interpreted per-row evaluation vs codegen. The unrolled
    * form wins on large corpora (the 100 TB path); this form wins when
    * the input is sketch-sized and OPTIMIZER time on the thousand-node
    * tree dominates end-to-end latency — the same adaptive choice as the
    * engine's local-solve fast paths, opted into by the caller. */
  def rhpSignatureCompact(vec: Column, dim: Int, planes: Int,
      seed: Long = 42L): Column = {
    val signs = signTable(dim, planes, seed)
    // slice to the first `dim` elements so a longer vector reads the same
    // prefix as the unrolled element_at form — zip_with would otherwise
    // null-pad the (shorter) sign side and poison the whole sum,
    // collapsing every over-length vector into one bucket
    val v = slice(vec.cast("array<double>"), 1, dim)
    val bits = (0 until planes).map { j =>
      val s = aggregate(
        zip_with(v, typedLit(signs(j).toSeq), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: band the signature into `bands`
    * buckets, candidates = same bucket in any band, then exact cosine +
    * window top-k on the candidates only.
    *
    * @param compactSig use [[rhpSignatureCompact]] (identical values,
    *   interpreted evaluation, ~10x smaller plan) — for sketch-sized
    *   inputs where planning dominates; leave false on large corpora. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      planes: Int = 16, bands: Int = 4, seed: Long = 42L,
      compactSig: Boolean = false): DataFrame = {
    require(planes % bands == 0)
    val r = planes / bands
    val mask = (1L << r) - 1
    // norms ride with the vectors through the banding (computed once per
    // row, not once per candidate pair — see bruteTopK)
    def withBuckets(df: DataFrame, idName: String, vecName: String,
        nName: String) =
      df.select(col("id").as(idName),
        col("vec").cast("array<double>").as(vecName),
        (if (compactSig) rhpSignatureCompact(col("vec"), dim, planes, seed)
         else rhpSignature(col("vec"), dim, planes, seed)).as("sig"))
        .withColumn(nName, sqrt(graft.functions.VectorExprs.dotFast(
          df.sparkSession, col(vecName), col(vecName), dim)))
        .select(col(idName), col(vecName), col(nName),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * r).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val q = withBuckets(queries, "query_id", "qv", "qn")
    val c = withBuckets(corpus, "neighbor_id", "cv", "cn")
    // score each banded candidate directly (the dot is cheap codegen now)
    // and dedupe multi-band collisions by ID with max(cos) — identical
    // per-pair values, and a scalar-key aggregation instead of a
    // distinct() that hashes two 64-double arrays per row
    val scored = q.join(c, Seq("band", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VectorExprs.dotFast(queries.sparkSession,
          col("qv"), col("cv"), dim) / (col("qn") * col("cn"))).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
