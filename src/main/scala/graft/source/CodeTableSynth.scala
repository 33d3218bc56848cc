package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the engine's ingest surface: a source-code
  * repository table with columns (repo, path, commit, lang, content) — the
  * BASELINE.json input_hint shape (an Iceberg table in production; Parquet
  * stands in here, see SURVEY.md section 7.1). Everything is a pure
  * function of the row index and the seed: no wall clock, no RNG state, so
  * any partitioning/parallelism produces identical rows.
  *
  * The companion edge synthesis plants an SBM-style community structure
  * (known ground truth for Leiden behavioral tests) with a configurable
  * hub fraction to exercise skew salting. Generation is distributed
  * (spark.range), never a driver-side loop.
  */
object CodeTableSynth {

  private val langs = Seq("scala", "java", "py", "rs", "go")
  private val exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py",
    "rs" -> "rs", "go" -> "go")

  /** n rows of (repo, path, commit, lang, content), deterministic in seed. */
  def sourceTable(spark: SparkSession, n: Long, nRepos: Int = 50,
      filesPerCommit: Int = 20, seed: Long = 42L): DataFrame = {
    val langArr = array(langs.map(lit): _*)
    val extArr = array(langs.map(l => lit(exts(l))): _*)
    spark.range(n).select(
      concat(lit("repo-"), col("id") % nRepos).as("repo"),
      col("id").as("_i"),
      (col("id") % langs.size).cast("int").as("_li"))
      .select(
        col("repo"),
        concat(lit("src/dir"),
          pmod(xxhash64(lit("dir"), col("_i"), lit(seed)), lit(37)),
          lit("/file"), col("_i"), lit("."), element_at(extArr, col("_li") + 1)
        ).as("path"),
        hex(xxhash64(lit("commit"), floor(col("_i") / filesPerCommit)
          .cast("long"), lit(seed))).as("commit"),
        element_at(langArr, col("_li") + 1).as("lang"),
        // pseudo-code body: length and tokens vary per row so the sha256
        // invariant is non-trivial
        concat(
          lit("def f"), col("_i"), lit("(x: Int): Int = x + "),
          pmod(xxhash64(lit("content"), col("_i"), lit(seed)), lit(9973)),
          lit(" // "),
          repeat(lit("lorem "),
            (pmod(xxhash64(lit("len"), col("_i"), lit(seed)), lit(40)) + 1)
              .cast("int"))
        ).as("content"))
  }

  /** Deterministic SBM-planted undirected edge table over vertex ids
    * 0..n-1 (dense ids for test oracles; production ids come from
    * [[Ingest.vertices]] hashing). Each vertex gets `degIntra` intra-block
    * and `degInter` inter-block candidate edges, sampled by hashing — a
    * pure function of (ids, seed). A `hubFraction` of vertices gets
    * `hubFactor` times the edges (skew).
    */
  def sbmEdges(spark: SparkSession, n: Long, nBlocks: Int,
      degIntra: Int = 8, degInter: Int = 1, hubFraction: Double = 0.0,
      hubFactor: Int = 50, seed: Long = 42L): DataFrame = {
    require(nBlocks > 0 && n >= nBlocks)
    val perBlock = n / nBlocks // block of v = v / perBlock (last gets slack)
    val ids = spark.range(n).select(col("id").as("src"),
      least(col("id") / perBlock, lit(nBlocks - 1)).cast("long").as("blk"),
      when(lit(hubFraction) > 0 &&
        pmod(xxhash64(lit("hub"), col("id"), lit(seed)), lit(10000)) <
          lit((hubFraction * 10000).toLong), lit(hubFactor))
        .otherwise(lit(1)).as("mult"))
    // k slots per vertex; slot -> deterministic partner inside/outside block
    val kTotal = degIntra + degInter
    val slots = ids.select(col("src"), col("blk"),
      explode(sequence(lit(0), col("mult") * kTotal - 1)).as("slot"))
    val blockBase = col("blk") * perBlock
    val intra = slots.where(pmod(col("slot"), lit(kTotal)) < degIntra)
      .select(col("src"),
        (blockBase + pmod(xxhash64(lit("in"), col("src"), col("slot"),
          lit(seed)), lit(perBlock))).as("dst"))
    val inter = slots.where(pmod(col("slot"), lit(kTotal)) >= degIntra)
      .select(col("src"),
        pmod(xxhash64(lit("out"), col("src"), col("slot"), lit(seed)),
          lit(n)).as("dst"))
    intra.unionAll(inter)
      .where(col("src") =!= col("dst"))
      .withColumn("weight", lit(1.0))
  }
}
