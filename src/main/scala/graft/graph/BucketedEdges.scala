package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

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
  *   4. STAGES the merged buckets under `_staging/`, writes an atomic
  *      COMMIT record, then swaps the touched buckets into the live
  *      table. Before COMMIT the live table is untouched (a crash rolls
  *      the staging back); after COMMIT the swap is deterministic and
  *      idempotent ([[recover]] rolls it forward).
  *
  * Idempotent replay: a merge tagged with a `batchId` records it in
  * `_meta/applied_<id>` (atomic create-and-rename) once the swap is
  * durable. Re-applying an already-recorded batch — the resume path
  * after a crash between the bucket merge and the engine's checkpoint
  * commit — is a no-op, so the delta's weights can never double-apply.
  *
  * Per-batch IO is O(|delta| / B * |E| + |delta|) — the touched-bucket
  * fraction of the table — instead of O(|E|); B sizes the tradeoff
  * between merge amplification (small B) and file count (large B).
  */
object BucketedEdges {

  val BUCKET = "bucket"
  private val META = "_meta"
  private val STAGING = "_staging"

  def bucketExpr(nBuckets: Int): Column =
    pmod(xxhash64(col(EdgeOps.SRC), col(EdgeOps.DST)), lit(nBuckets))

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

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
  def lastApplied(spark: SparkSession, path: String): Option[Long] = {
    val fs = fsFor(spark, path)
    val dir = new Path(s"$path/$META")
    if (!fs.exists(dir)) None
    else {
      val ids = fs.listStatus(dir).iterator.map(_.getPath.getName)
        .collect { case n if n.startsWith("applied_") =>
          try Some(n.stripPrefix("applied_").toLong)
          catch { case _: NumberFormatException => None }
        }.flatten.toSeq
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Record `batchId` as applied: create-and-rename (both atomic; the
    * new name never pre-exists), then prune older markers. */
  private def writeApplied(fs: FileSystem, path: String, batchId: Long)
      : Unit = {
    val dir = new Path(s"$path/$META")
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".applied_tmp_$batchId")
    val out = fs.create(tmp, true)
    out.write(batchId.toString.getBytes("UTF-8")); out.close()
    val fin = new Path(dir, s"applied_$batchId")
    if (!fs.exists(fin)) { val _ = fs.rename(tmp, fin) }
    else { val _ = fs.delete(tmp, false) }
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("applied_") &&
        n.stripPrefix("applied_").toLongOption.exists(_ < batchId)) {
        val _ = fs.delete(st.getPath, false)
      }
    }
  }

  /** Deterministic, idempotent half of the two-phase merge: for every
    * touched bucket, remove the live directory and move the staged one
    * in (surviving buckets) or just remove it (fully-cancelled buckets).
    * Safe to re-run from any crash point after COMMIT: a staged bucket
    * already moved simply isn't there any more. */
  private def swapIn(fs: FileSystem, path: String, touched: Seq[Long],
      surviving: Set[Long]): Unit =
    touched.foreach { b =>
      val live = new Path(s"$path/$BUCKET=$b")
      val staged = new Path(s"$path/$STAGING/data/$BUCKET=$b")
      if (surviving(b)) {
        if (fs.exists(staged)) {
          val _ = fs.delete(live, true)
          val _2 = fs.rename(staged, live)
        } // else: this bucket was already swapped before the crash
      } else { val _ = fs.delete(live, true) }
    }

  /** Crash recovery: roll a committed-but-unswapped merge forward, or
    * roll an uncommitted staging back. Run before every merge and before
    * the engine opens the store. */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val staging = new Path(s"$path/$STAGING")
    if (!fs.exists(staging)) return
    val commit = new Path(staging, "COMMIT")
    if (fs.exists(commit)) {
      val in = fs.open(commit)
      val bytes = new Array[Byte](fs.getFileStatus(commit).getLen.toInt)
      in.readFully(bytes); in.close()
      val om = new com.fasterxml.jackson.databind.ObjectMapper
      val root = om.readTree(new String(bytes, "UTF-8"))
      val touched = (0 until root.path("touched").size())
        .map(root.path("touched").get(_).asLong())
      val surviving = (0 until root.path("surviving").size())
        .map(root.path("surviving").get(_).asLong()).toSet
      swapIn(fs, path, touched, surviving)
      if (root.path("batch").isNumber)
        writeApplied(fs, path, root.path("batch").asLong())
    }
    // rolled forward, or never committed (live table untouched): either
    // way the staging area is now garbage
    val _ = fs.delete(staging, true)
    spark.catalog.refreshByPath(path)
  }

  /** Merge a signed canonical delta, touching only its buckets.
    * Returns the touched bucket ids (empty when the batch was already
    * applied under `batchId` — the idempotent-replay no-op).
    * `deltaCanon` must be canonical (src <= dst, parallel edges merged)
    * and small enough to hash on the driver's bucket list — i.e. a
    * batch, not a full table. */
  def mergeDelta(spark: SparkSession, path: String, deltaCanon: DataFrame,
      nBuckets: Int, eps: Double = 1e-9,
      batchId: Option[Long] = None): Seq[Long] = {
    recover(spark, path)
    if (batchId.exists(b => lastApplied(spark, path).exists(_ >= b)))
      return Nil // already durably applied — replay after a crash
    val fs = fsFor(spark, path)

    val d = deltaCanon
      .select(col(EdgeOps.SRC), col(EdgeOps.DST), col(EdgeOps.W))
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .localCheckpoint(true)
    val touched = d.select(BUCKET).distinct().collect()
      .map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) {
      batchId.foreach(writeApplied(fs, path, _))
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
    val stagingData = s"$path/$STAGING/data"
    merged.write.mode("overwrite").partitionBy(BUCKET).parquet(stagingData)
    val surviving = merged.select(BUCKET).distinct().collect()
      .map(_.getLong(0)).toSet

    // phase 2: atomic COMMIT record (tmp + rename), then the idempotent
    // swap; a crash mid-swap is rolled forward by recover()
    val commitTmp = new Path(s"$path/$STAGING/.COMMIT.tmp")
    val out = fs.create(commitTmp, true)
    val json =
      s"""{"batch":${batchId.map(_.toString).getOrElse("null")},""" +
        s""""touched":[${touched.mkString(",")}],""" +
        s""""surviving":[${surviving.toSeq.sorted.mkString(",")}]}"""
    out.write(json.getBytes("UTF-8")); out.close()
    val _ = fs.rename(commitTmp, new Path(s"$path/$STAGING/COMMIT"))

    swapIn(fs, path, touched, surviving)
    batchId.foreach(writeApplied(fs, path, _))
    val _2 = fs.delete(new Path(s"$path/$STAGING"), true)
    // drop the session's cached file listing for the path — readers
    // created before the merge would otherwise chase replaced files
    spark.catalog.refreshByPath(path)
    touched
  }
}
