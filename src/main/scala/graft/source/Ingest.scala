package graft.source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest: source-code table -> link-graph vertex/edge tables.
  *
  * This is the real version of the reference's stubbed snapshot projection
  * (/root/reference/src/core/graph/neo4j_snapshot.rs:10-19): rows of
  * (repo, path, commit, lang, content) are hashed to stable 64-bit vertex
  * ids, and edges are derived from co-occurrence relations that make sense
  * for a code graph. Ids are xxhash64(repo, path, commit, content) —
  * non-dense by design; no operator downstream assumes density
  * (SURVEY.md section 1.2).
  *
  * Per-row invariant (north rule): sha256(content) of every ingested row
  * equals the source row's — carried as `content_sha` and asserted by
  * [[checkInvariant]].
  *
  * Id space: hashes are masked to 62 bits. The top quarter of the Long
  * range is RESERVED for synthetic subcommunity ids — the incremental
  * engine's largest-component-keeps-id splits allocate fresh ids above
  * the observed maximum (Incremental.State.maxId), and a full-range hash
  * would leave no headroom for the counter.
  */
object Ingest {

  /** Mask keeping ids in [0, 2^62): headroom for synthetic id allocation. */
  val IdMask: Long = (1L << 62) - 1

  private def rowId = xxhash64(col("repo"), col("path"), col("commit"),
    col("content")).bitwiseAND(lit(IdMask))

  /** (id, repo, path, commit, lang, content_sha). One vertex per row. */
  def vertices(source: DataFrame): DataFrame =
    source.select(
      rowId.as("id"),
      col("repo"), col("path"), col("commit"), col("lang"),
      sha2(col("content"), 256).as("content_sha"))

  /** Edges between files sharing a commit (co-change graph): for each
    * commit, link consecutive files in (repo, path) order — a chain, so a
    * commit of k files yields k-1 edges instead of the k^2/2 clique that
    * would blow up on monorepo-sized commits (the hub-skew trap at scale;
    * a clique variant is capped below).
    */
  def coCommitEdges(source: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = source.select(
      rowId.as("id"),
      col("repo"), col("path"), col("commit"))
    val w = Window.partitionBy("commit").orderBy("repo", "path")
    v.withColumn("prev", lag(col("id"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev").as("src"), col("id").as("dst"),
        lit(1.0).as("weight"))
  }

  /** Verifies the per-row sha256 invariant between a source table and its
    * ingested vertices: every source row's sha2(content,256) appears for
    * the matching (repo, path, commit). Returns the number of violating
    * rows (0 = invariant holds).
    */
  def checkInvariant(source: DataFrame, verts: DataFrame): Long =
    source.select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("expected_sha"))
      .join(verts.select(col("repo"), col("path"), col("commit"),
        col("content_sha")), Seq("repo", "path", "commit"), "left")
      .where(col("content_sha").isNull ||
        col("content_sha") =!= col("expected_sha"))
      .count()
}
