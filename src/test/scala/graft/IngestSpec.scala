package graft

import org.apache.spark.sql.functions._
import graft.source.{CodeTableSynth, Ingest}

/** Ingest surface: source-code table -> vertices/edges, sha256 invariant
  * (north rule), determinism of the synthesis. */
class IngestSpec extends SparkSpecBase {

  lazy val src = CodeTableSynth.sourceTable(spark, n = 200).cache()

  test("source table has the input_hint schema and deterministic content") {
    assert(src.columns.toSeq ==
      Seq("repo", "path", "commit", "lang", "content"))
    assert(src.count() == 200)
    // same rows regardless of partitioning (pure function of row index);
    // pmod before sum avoids ANSI long-overflow on raw hash sums
    def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(pmod(xxhash64(col("repo"), col("path"), col("commit"),
        col("lang"), col("content")), lit(1000000007L))))
        .collect()(0).getLong(0)
    assert(fingerprint(src) ==
      fingerprint(CodeTableSynth.sourceTable(spark, 200).repartition(7)))
  }

  test("sha256 invariant holds for every ingested row") {
    val verts = Ingest.vertices(src)
    assert(Ingest.checkInvariant(src, verts) == 0L)
    assert(verts.count() == 200)
    // ids are unique (hash collisions would violate the vertex model)
    assert(verts.select("id").distinct().count() == 200)
  }

  test("sha256 invariant detects corruption") {
    val corrupted = Ingest.vertices(src)
      .withColumn("content_sha",
        when(col("lang") === "py", lit("deadbeef"))
          .otherwise(col("content_sha")))
    assert(Ingest.checkInvariant(src, corrupted) > 0L)
  }

  test("co-commit edges form chains: k files in a commit -> k-1 edges") {
    val edges = Ingest.coCommitEdges(src)
    val perCommit = src.groupBy("commit").agg(count(lit(1)).as("k"))
    val expected = perCommit.agg(sum(col("k") - 1)).collect()(0).getLong(0)
    assert(edges.count() == expected)
    // no self loops
    assert(edges.where(col("src") === col("dst")).count() == 0)
  }

  test("end to end: ingest -> leiden communities over the code graph") {
    val edges = Ingest.coCommitEdges(src)
    val r = graft.algo.Leiden.run(edges)
    val n = graft.graph.EdgeOps.vertices(edges).count()
    assert(r.assignment.count() == n)
    // chains within commits connect files; communities should be coarser
    // than singletons
    assert(r.communityCount < n)
  }
}
