package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.EdgeOps
import graft.algo._

/** Driver-harness queries: each is a DataFrame job over the read-only
  * `/root/testdata/sf*` tables, paired (where SQL-expressible) with a
  * DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * The link graph under test is derived from `lineitem` by portable
  * integer arithmetic (same expression evaluates identically in Spark and
  * DuckDB): src = l_orderkey % 1500, dst = (l_partkey*7 + l_suppkey) %
  * 1500, self-loops dropped, parallel edges merged with weight =
  * multiplicity. ~1.5k vertices, tens of thousands of edges at sf0.01.
  */
object Queries {

  /** The derived undirected multigraph (src, dst, weight=1.0 per row). */
  def lineitemGraph(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") % 1500).as("src"),
        ((col("l_partkey") * 7 + col("l_suppkey")) % 1500).as("dst"))
      .where(col("src") =!= col("dst"))
      .withColumn("weight", lit(1.0))

  /** SQL prelude producing the identical graph in DuckDB. */
  val graphSqlPrelude: String =
    """raw AS (
      |  SELECT l_orderkey % 1500 AS a, (l_partkey*7 + l_suppkey) % 1500 AS b
      |  FROM lineitem WHERE l_orderkey % 1500 <> (l_partkey*7 + l_suppkey) % 1500
      |),
      |canon AS (
      |  SELECT least(a,b) AS src, greatest(a,b) AS dst,
      |         CAST(count(*) AS DOUBLE) AS weight
      |  FROM raw GROUP BY 1,2
      |),
      |adj AS (
      |  SELECT src, dst, weight FROM canon
      |  UNION ALL SELECT dst, src, weight FROM canon
      |),
      |verts AS (SELECT DISTINCT src AS v FROM adj)""".stripMargin

  // --- graph operator queries -------------------------------------------

  def qDegree(spark: SparkSession, dir: String): DataFrame =
    EdgeOps.degrees(EdgeOps.symmetrize(
      EdgeOps.compress(lineitemGraph(spark, dir))))

  def qCompress(spark: SparkSession, dir: String): DataFrame =
    EdgeOps.compress(lineitemGraph(spark, dir))

  def qTriangles(spark: SparkSession, dir: String): DataFrame = {
    val n = TriangleCount.total(lineitemGraph(spark, dir))
    import spark.implicits._
    Seq(n).toDF("triangles")
  }

  def qCc(spark: SparkSession, dir: String): DataFrame =
    ConnectedComponents.run(lineitemGraph(spark, dir)).components

  def qPagerank(spark: SparkSession, dir: String): DataFrame =
    PageRank.run(lineitemGraph(spark, dir), numIter = 5, tol = 0.0)
      .ranks.select(col("v"), round(col("rank"), 4).as("rank"))

  def qLpa(spark: SparkSession, dir: String): DataFrame =
    LabelPropagation.run(lineitemGraph(spark, dir), maxIter = 10).labels

  /** The derived graph has at most 1,500 vertices regardless of SF —
    * exactly the shape the level-0 sequential bound exists for (dozens of
    * fixed-cost BSP sweeps vs seconds on one core; the distributed path
    * stays exercised by the test suite and any graph over the bound). */
  def qLeiden(spark: SparkSession, dir: String): DataFrame =
    Leiden.run(lineitemGraph(spark, dir),
      Leiden.Config(localSolveLevel0Verts = 100000)).assignment

  def qTrianglesPerVertex(spark: SparkSession, dir: String): DataFrame =
    TriangleCount.perVertex(lineitemGraph(spark, dir))

  /** Modularity of the connected-components partition — oracle-verifiable
    * quality scoring (two aggregations over exact-integer sums, so the
    * value is bit-reproducible against SQL). */
  def qModularity(spark: SparkSession, dir: String): DataFrame = {
    val g = lineitemGraph(spark, dir)
    val canon = EdgeOps.compress(g)
    val assign = ConnectedComponents.run(g).components
      .select(col("v"), col("component").as("community"))
    val q = Quality.modularity(canon, assign)
    import spark.implicits._
    Seq(q).toDF("q").select(round(col("q"), 6).as("modularity"))
  }

  /** CPM quality of the connected-components partition (gamma = 1). */
  def qCpm(spark: SparkSession, dir: String): DataFrame = {
    val g = lineitemGraph(spark, dir)
    val canon = EdgeOps.compress(g)
    val assign = ConnectedComponents.run(g).components
      .select(col("v"), col("component").as("community"))
    val q = Quality.cpm(canon, assign)
    import spark.implicits._
    Seq(q).toDF("q").select(round(col("q"), 6).as("cpm"))
  }

  /** Embedding-cosine near-duplicate pairs (exact baseline, oracled; the
    * LSH-bucketed variant is the 100 TB path — see
    * [[graft.dedup.Dedup.embeddingNearDupLsh]]). */
  def qEmbDedup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.embeddingNearDupExact(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec")),
      minCos = 0.35, dim = 64) // ~270 pairs at either SF

  /** Multimodal metadata decode over the deterministic synthetic media
    * table (no external data; the codec is a documented stub — the Spark
    * plumbing is what this exercises). Rows-only driver check. */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.Multimodal.decodeMeta(
      graft.multimodal.Multimodal.synthMedia(spark, 512)).toDF()

  /** Frame sampling + feature extraction over the synthetic media table
    * (rows-only): per media, sampled frame count and embedding norm of
    * the extracted feature — exercises the one-row-in/k-rows-out and
    * mapPartitions batch shapes end to end. */
  def qMediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.synthMedia(spark, 512)
    val frames = graft.multimodal.Multimodal.frameSample(media).toDF()
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
    val feats = graft.multimodal.Multimodal.featureExtract(media).toDF()
      .select(col("media_id"),
        round(graft.ann.Ann.norm(col("embedding").cast("array<double>")), 4)
          .as("feat_norm"))
    frames.join(feats, "media_id")
  }

  // --- training-data pipeline queries over `documents` -------------------

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))

  /** Unigram Jaccard similarity for consecutive doc-id pairs — exact
    * n-gram dedup scoring with a portable SQL oracle. */
  def qJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ids = docs.select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("id_a"),
      (col("doc_id") + 1).as("id_b"))
      .join(ids.select(col("doc_id").as("id_b")), "id_b")
    graft.dedup.Dedup.jaccardForPairs(docs, pairs, w = 1)
  }

  def qMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.minhashLshPairs(
      spark.read.parquet(s"$dir/documents.parquet"),
      numHashes = 32, bands = 8, minEstJaccard = 0.2)

  def qSimhashNear(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.simhashNearPairs(
      spark.read.parquet(s"$dir/documents.parquet"), maxHamming = 8)

  def qLangid(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.text.TextOps.languageId(col("text"))
        .as("lang_guess"))

  def qQuality(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextOps.qualityScore(col("text")).as("quality"),
        graft.text.TextOps.subwordCount(col("text")).as("n_subwords"))

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextOps.shingleFingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.min_hash").as("min_hash"),
        col("fp.max_hash").as("max_hash"))

  def qAnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    graft.ann.Ann.bruteTopK(emb.where(col("id") < 10), emb, k = 5, dim = 64)
  }

  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    graft.ann.Ann.lshTopK(emb.where(col("id") < 10), emb, k = 5, dim = 64)
  }

  def qTextStats(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      (length(col("text")) -
        length(regexp_replace(col("text"), lit(" "), lit(""))) + 1)
        .cast("long").as("n_tokens"),
      round(
        (length(col("text")) -
          length(regexp_replace(col("text"), lit("[^a-zA-Z0-9 ]"), lit(""))))
          .cast("double") / length(col("text")).cast("double"), 4)
        .as("punct_ratio"))
  }
}
