package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All deterministic (hash
  * functions are seeded xxhash64 — pure functions of content), all
  * expressed as scans + hash aggregations so they scale linearly:
  *
  *  - exact: one groupBy on a content hash (one shuffle);
  *  - MinHash signatures: one explode + one groupBy(doc) with H min
  *    aggregates (map-side partial aggregation collapses the shingle
  *    blowup before the shuffle);
  *  - LSH banding: explode H-length signature into B bands, groupBy
  *    (band, bandHash) — candidate pairs only ever meet inside a bucket,
  *    never a cross join;
  *  - SimHash: explode tokens + 64 signed-bit sums per doc, again
  *    map-side combined.
  */
object Dedup {

  /** Spread an under-parallelized input across the session's parallelism
    * before per-row CPU-heavy work (signature hashing): a small parquet
    * source arrives as ONE row-group partition and would otherwise run
    * the whole interpreted higher-order-function pipeline in a single
    * task. A source already at (or above) session parallelism — any
    * at-scale table — passes through untouched, so no shuffle is added
    * on the 100 TB path. Round-robin repartition is deterministic
    * (sort-before-repartition) and row values are unchanged. */
  private def spread(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }

  /** Exact duplicate groups by full-content hash.
    * Output: (text_hash, n, keep_id) — keep the minimum id. */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** The DISTINCT word-w-shingle hash set of one document as a per-row
    * array column — the same 64-bit grams [[shingles]] emits, deduped
    * with array_distinct instead of a distinct() shuffle (identical set:
    * distinct() on (id, shingle) dedups within each id). One projection,
    * no shuffle — the whole shingle pipeline stays inside the scan. */
  def shingleSet(textCol: Column, w: Int = 3): Column = {
    val tokens = filter(split(textCol, "\\s+"), t => length(t) > 0)
    val n = greatest(size(tokens) - (w - 1), lit(1))
    array_distinct(transform(sequence(lit(0), n - 1),
      i => xxhash64(concat_ws(" ", slice(tokens, i + 1, lit(w))))))
  }

  /** (id, shingle_hash) pairs: word w-shingles hashed to 64 bits. */
  def shingles(docs: DataFrame, textCol: String, idCol: String,
      w: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(shingleSet(col(textCol), w)).as("shingle"))

  /** MinHash signatures: H permutations via seeded rehash of the shingle.
    * Output: (id, sig ARRAY<BIGINT> length numHashes).
    *
    * Computed per ROW (sig[i] = array_min over the shingle set of
    * xxhash64(shingle, lit(i))) — two stacked projections over the scan,
    * zero shuffles, instead of explode + distinct + an H-min-aggregate
    * shuffle. Values identical: min over the distinct set equals the
    * grouped min over exploded distinct rows, with the same IntegerType
    * literal seed. The shingle array is built in its own projection and
    * referenced numHashes times by the second — CollapseProject keeps a
    * multiply-referenced non-trivial expression un-inlined, so the
    * tokenize+hash+dedup work runs once per document, not per hash
    * (verified: the physical plan carries exactly ONE array_distinct in
    * its own Project below the signature Project —
    * plans/r06/minhash_signatures_after.txt). */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 64,
      shingleWidth: Int = 3): DataFrame =
    spread(docs).select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleWidth).as("sh"))
      .select(col("id"), array((0 until numHashes).map(i =>
        array_min(transform(col("sh"), s => xxhash64(s, lit(i))))): _*)
        .as("sig"))

  /** LSH candidate pairs: band the signature, bucket-join, estimate
    * jaccard = matching minhash fraction. Output:
    * (id_a, id_b, est_jaccard) with id_a < id_b, distinct. */
  def minhashLshPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 64, bands: Int = 16,
      shingleWidth: Int = 3, minEstJaccard: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val sig = minhashSignatures(docs, textCol, idCol, numHashes,
      shingleWidth).localCheckpoint(true)
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          transform(slice(col("sig"), b * r + 1, lit(r)),
            (x: Column) => x.cast("string")))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), (m: Column) => m)).cast("double") / numHashes)
          .as("est_jaccard"))
      .distinct()
    pairs.where(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash over whitespace tokens. Output: (id, simhash). */
  def simhash(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tok = spread(docs).select(col(idCol).as("id"),
      explode(split(col(textCol), "\\s+")).as("t"))
      .where(length(col("t")) > 0)
      .withColumn("h", xxhash64(col("t")))
    // per bit: sum of +/-1 by bit value; sign -> bit. 64 aggregates, one
    // shuffle, map-side combined.
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    val agg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** Hamming-close SimHash pairs via pigeonhole LSH: split the 64-bit
    * hash into `maxHamming + 1` pieces — two hashes within `maxHamming`
    * bit flips MUST agree exactly on at least one piece (pigeonhole), so
    * bucket-joining on (piece index, piece value) has 100% recall; a
    * bit_count verify drops false candidates. Piece count scales with the
    * radius: small radii keep pieces wide (few, cheap buckets); beyond
    * ~7 the pieces get narrow and buckets large — prefer radius <= 7 at
    * scale. */
  def simhashNearPairs(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    nearPairsFromHashes(
      simhash(docs, textCol, idCol).localCheckpoint(true), maxHamming)

  /** Pigeonhole bucket-join over precomputed (id, simhash) rows — the
    * testable core of [[simhashNearPairs]]. */
  def nearPairsFromHashes(sh: DataFrame, maxHamming: Int): DataFrame = {
    val nPieces = maxHamming + 1
    val base = 64 / nPieces // first pieces get an extra bit if 64 % nPieces
    val extra = 64 % nPieces
    // piece p covers bits [off(p), off(p)+width(p)) with widths summing 64
    def off(p: Int): Int = p * base + math.min(p, extra)
    def width(p: Int): Int = base + (if (p < extra) 1 else 0)
    val pieces = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until nPieces).map { p =>
        val mask = if (width(p) >= 64) -1L else (1L << width(p)) - 1
        shiftrightunsigned(col("simhash"), off(p)).bitwiseAND(lit(mask))
      }: _*)))
      .withColumnRenamed("pos", "piece").withColumnRenamed("col", "pval")
    val a = pieces.select(col("piece"), col("pval"), col("id").as("id_a"),
      col("simhash").as("s_a"))
    val b = pieces.select(col("piece"), col("pval"), col("id").as("id_b"),
      col("simhash").as("s_b"))
    a.join(b, Seq("piece", "pval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("s_a").bitwiseXOR(col("s_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs, exact: all pairs with
    * cosine >= minCos (id_a < id_b). O(n^2) by construction — the
    * correctness baseline for [[embeddingNearDupLsh]]; vectors are cast
    * to double so the arithmetic is bit-reproducible against a SQL
    * oracle. `emb`: (id, vec ARRAY<FLOAT>). */
  def embeddingNearDupExact(emb: DataFrame, minCos: Double,
      dim: Int = 0): DataFrame = {
    import graft.ann.Ann
    // norms once per ROW (carried through the join), not per pair; with a
    // statically-known dim the per-pair dot is the codegen'd unrolled
    // form. Same arithmetic as Ann.cosine — values bit-identical to the
    // SQL oracle.
    // dim known -> ONE codegen'd loop per pair (graft.functions.DotProduct)
    // instead of a dim-deep element_at chain; same accumulation order,
    // bit-identical values (CORRECTNESS gate pins it vs the SQL oracle)
    val ss = emb.sparkSession
    def nrm(c: Column) = if (dim > 0)
      sqrt(graft.functions.VectorExprs.dotFast(ss, c, c, dim))
      else Ann.norm(c)
    def dp(x: Column, y: Column) =
      if (dim > 0) graft.functions.VectorExprs.dotFast(ss, x, y, dim)
      else Ann.dot(x, y)
    // a small parquet source arrives as ONE partition; without the
    // repartition the whole O(n^2) pair evaluation runs in a single task.
    // Spread the stream side across the session's parallelism and
    // broadcast the build side (it is small by precondition — this is
    // the labeled exact baseline, never the scale path).
    val parts = emb.sparkSession.sessionState.conf.numShufflePartitions
    val a = emb.select(col("id").as("id_a"),
      col("vec").cast("array<double>").as("va"))
      .withColumn("na", nrm(col("va")))
      .repartition(parts)
    val b = emb.select(col("id").as("id_b"),
      col("vec").cast("array<double>").as("vb"))
      .withColumn("nb", nrm(col("vb")))
    a.crossJoin(broadcast(b)).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dp(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("cos"))
      .where(col("cos") >= minCos)
  }

  /** Embedding-cosine near-duplicate pairs at scale: random-hyperplane
    * LSH bands bucket the candidates (no cross join), exact cosine
    * verifies. Recall < 1 by design — the price of scale; tune
    * planes/bands for the target radius. */
  def embeddingNearDupLsh(emb: DataFrame, minCos: Double, dim: Int,
      planes: Int = 16, bands: Int = 4, seed: Long = 42L,
      compactSig: Boolean = false): DataFrame = {
    import graft.ann.Ann
    require(planes % bands == 0)
    val r = planes / bands
    val mask = (1L << r) - 1
    val sig = emb.select(col("id"),
      col("vec").cast("array<double>").as("v"),
      (if (compactSig) Ann.rhpSignatureCompact(col("vec"), dim, planes, seed)
       else Ann.rhpSignature(col("vec"), dim, planes, seed)).as("sig"))
      .withColumn("n", Ann.normN(col("v"), dim))
      .select(col("id"), col("v"), col("n"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * r).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    sig.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("v").as("va"), col("n").as("na"))
      .join(sig.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("v").as("vb"), col("n").as("nb")), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.VectorExprs.dotFast(emb.sparkSession,
          col("va"), col("vb"), dim) / (col("na") * col("nb")), 6).as("cos"))
      .where(col("cos") >= minCos) // filter BEFORE the dedup shuffle
      .distinct()
  }

  /** Exact n-gram (word w-shingle) Jaccard for given candidate pairs
    * (id_a, id_b): each side's DISTINCT shingle set rides as a per-doc
    * array, intersection/union are per-pair array ops — two joins total,
    * no exploded-shingle shuffle and no per-pair groupBy. Counts are the
    * same integers the exploded set-intersection form produced
    * (array_intersect over two deduped arrays = the distinct-match
    * count), so values are identical. Payload note: each pair carries
    * its two shingle arrays once — same bytes the exploded join moved,
    * in 1 row instead of |shingles| rows. */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      w: Int = 1): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingleSet(col(textCol), w).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b")))
          .cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("sz_a"),
        size(col("sh_b")).cast("long").as("sz_b"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }
}
