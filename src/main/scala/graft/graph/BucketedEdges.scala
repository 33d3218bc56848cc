package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.state.BucketStore

/** Durable canonical edge table partitioned by hash bucket — the
  * petabyte-scale form of [[EdgeOps.mergeDelta]]'s broadcast merge that
  * the engine scaladoc promises ("at petabyte scale the same idea is a
  * bucket-pruned merge into a bucketed table").
  *
  * Layout: parquet partitioned by `bucket = pmod(xxhash64(src, dst), B)`.
  * A delta batch touches at most |delta| buckets, so a merge
  *
  *   1. hashes the delta and collects its distinct bucket ids (bounded
  *      by min(|delta|, B) — a driver list, never a table);
  *   2. reads ONLY those partitions (directory-level partition pruning —
  *      the scan never opens untouched buckets);
  *   3. compresses touched rows + delta (group-sum, epsilon drop);
  *   4. commits through the shared two-phase protocol
  *      ([[graft.state.BucketStore]]): staged buckets, atomic COMMIT,
  *      idempotent swap, applied-batch marker.
  *
  * Idempotent replay: a merge tagged with a `batchId` records it once
  * the swap is durable; re-applying an already-recorded batch — the
  * resume path after a crash between the bucket merge and the engine's
  * checkpoint commit — is a no-op, so the delta's weights can never
  * double-apply.
  *
  * Per-batch IO is O(|delta| / B * |E| + |delta|) — the touched-bucket
  * fraction of the table — instead of O(|E|); B sizes the tradeoff
  * between merge amplification (small B) and file count (large B).
  */
object BucketedEdges {

  val BUCKET: String = BucketStore.BUCKET

  def bucketExpr(nBuckets: Int): Column =
    pmod(xxhash64(col(EdgeOps.SRC), col(EdgeOps.DST)), lit(nBuckets))

  /** Write a canonical edge table as a bucket-partitioned store.
    * Overwrite mode clears the whole path, so a re-seed also resets the
    * applied-batch markers and any staging leftovers. */
  def write(canon: DataFrame, path: String, nBuckets: Int): Unit =
    canon.select(col(EdgeOps.SRC), col(EdgeOps.DST), col(EdgeOps.W))
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .repartition(col(BUCKET))
      .write.mode("overwrite").partitionBy(BUCKET).parquet(path)

  /** The full canonical table (bucket column dropped). `_meta` and
    * `_staging` are underscore-prefixed, so parquet readers skip them. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col(EdgeOps.SRC), col(EdgeOps.DST), col(EdgeOps.W))

  /** Highest batch id recorded as durably applied, if any. */
  def lastApplied(spark: SparkSession, path: String): Option[Long] =
    BucketStore.lastApplied(spark, path)

  /** Crash recovery — see [[graft.state.BucketStore.recover]]. */
  def recover(spark: SparkSession, path: String): Unit =
    BucketStore.recover(spark, path)

  /** Merge a signed canonical delta, touching only its buckets.
    * Returns the touched bucket ids (empty when the batch was already
    * applied under `batchId` — the idempotent-replay no-op).
    * `deltaCanon` must be canonical (src <= dst, parallel edges merged)
    * and small enough to hash on the driver's bucket list — i.e. a
    * batch, not a full table. */
  def mergeDelta(spark: SparkSession, path: String, deltaCanon: DataFrame,
      nBuckets: Int, eps: Double = 1e-9,
      batchId: Option[Long] = None): Seq[Long] = {
    BucketStore.recover(spark, path)
    if (batchId.exists(b => lastApplied(spark, path).exists(_ >= b)))
      return Nil // already durably applied — replay after a crash
    val fs = BucketStore.fsFor(spark, path)

    val d = deltaCanon
      .select(col(EdgeOps.SRC), col(EdgeOps.DST), col(EdgeOps.W))
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .localCheckpoint(true)
    val touched = d.select(BUCKET).distinct().collect()
      .map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) {
      batchId.foreach(BucketStore.writeApplied(fs, path, _))
      return touched
    }

    // partition pruning: only the touched directories are listed/read
    val existing = spark.read.parquet(path)
      .where(col(BUCKET).isInCollection(touched))
      .select(col(EdgeOps.SRC), col(EdgeOps.DST), col(EdgeOps.W))
    val merged = EdgeOps.compress(
      existing.unionAll(d.drop(BUCKET)), eps)
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .localCheckpoint(true) // plan the write off a materialized table

    // phase 1: stage the merged buckets — the live table is untouched
    // until COMMIT exists, so a crash here simply rolls the staging back
    merged.write.mode("overwrite").partitionBy(BUCKET)
      .parquet(BucketStore.stagingData(path))
    val surviving = merged.select(BUCKET).distinct().collect()
      .map(_.getLong(0)).toSet

    // phase 2: shared protocol — atomic COMMIT, idempotent swap, marker
    BucketStore.commitAndSwap(spark, path, touched, surviving, batchId)
    touched
  }
}
