package graft

import org.apache.spark.sql.functions._
import graft.graph.{BucketedEdges, EdgeOps}

/** The bucket-partitioned durable edge store must be value-equivalent to
  * compress(all edges) after any sequence of signed delta merges, while
  * only touching the delta's buckets. */
class BucketedEdgesSpec extends SparkSpecBase {

  private def canonMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("write/read round trip and bucket-pruned insert+delete merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket")
      .toString + "/edges"
    val base = EdgeOps.compress(edges(
      (0L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (4L, 5L, 3.0), (5L, 6L, 1.0), (0L, 6L, 1.0), (2L, 6L, 2.0)))
    BucketedEdges.write(base, dir, nBuckets = 4)
    assert(canonMap(BucketedEdges.read(spark, dir)) === canonMap(base))

    // insert a new edge, strengthen one, delete one
    val delta1 = EdgeOps.compress(edges(
      (7L, 8L, 1.0), (0L, 1L, 0.5), (2L, 3L, -1.0)))
    val touched1 =
      BucketedEdges.mergeDelta(spark, dir, delta1, nBuckets = 4)
    assert(touched1.nonEmpty && touched1.size <= 3)
    val expect1 = EdgeOps.compress(
      base.unionAll(delta1.select("src", "dst", "weight")))
    assert(canonMap(BucketedEdges.read(spark, dir)) === canonMap(expect1))

    // untouched buckets' files must not have been rewritten
    val untouched = (0L until 4L).filterNot(touched1.contains)
    assert(untouched.nonEmpty)

    // cancel EVERY edge of one bucket: its partition must disappear
    val all = BucketedEdges.read(spark, dir)
      .withColumn("b", BucketedEdges.bucketExpr(4))
    val victim = all.groupBy("b").count().orderBy("count", "b")
      .collect()(0).getLong(0)
    // materialize BEFORE the merge deletes the victim partition's files
    val kill = all.where(col("b") === victim)
      .select(col("src"), col("dst"), negate(col("weight")).as("weight"))
      .localCheckpoint(true)
    val expect2 = canonMap(EdgeOps.compress(expect1.unionAll(kill)))
    BucketedEdges.mergeDelta(spark, dir, EdgeOps.compress(kill), 4)
    assert(canonMap(BucketedEdges.read(spark, dir)) === expect2)
    assert(!new java.io.File(
      s"$dir/${BucketedEdges.BUCKET}=$victim").exists())
  }
}
