package graft.state

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Durable assignment table `(v, community, subcomm)` partitioned by
  * `bucket = pmod(xxhash64(v), B)` — the vertex-side counterpart of
  * [[graft.graph.BucketedEdges]], completing the durable form of the
  * reference's whole-`PartitionState` contract
  * (/root/reference/src/core/partition/state.rs:4-16): after round 4 the
  * EDGE side of the state was bucket-pruned durable but the assignment
  * was still a full O(V) parquet dump per batch.
  *
  * A warm batch changes only frontier-adjacent rows, so [[upsert]] takes
  * the CHANGED rows (new values, including brand-new vertices), rewrites
  * only their buckets through the shared two-phase protocol
  * ([[BucketStore]]), and per-batch durable IO drops from O(V) to
  * O(|changed| / B * V + |changed|).
  *
  * Crash window (merge durably applied, engine checkpoint not yet
  * committed): unlike the edge store — whose pre-delta view is
  * reconstructible by un-merging the signed delta — an overwritten
  * assignment row is information lost. [[upsert]] therefore first writes
  * a delta-sized UNDO file (`_undo/batch=<id>`: the touched keys' prior
  * rows, plus insert markers for new keys); [[preView]] folds it over
  * the live table to rebuild the pre-batch assignment, and the engine
  * replays the batch deterministically from that view while the store's
  * own merge no-ops on the applied marker.
  */
object BucketedAssign {

  val BUCKET: String = BucketStore.BUCKET
  private val COLS = Seq("v", "community", "subcomm")

  def bucketExpr(nBuckets: Int): Column =
    pmod(xxhash64(col("v")), lit(nBuckets))

  /** Seed (or reset) the store with a full assignment table. */
  def write(assign: DataFrame, path: String, nBuckets: Int): Unit =
    assign.select(COLS.map(col): _*)
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .repartition(col(BUCKET))
      .write.mode("overwrite").partitionBy(BUCKET).parquet(path)

  /** The full live assignment (bucket column dropped). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(COLS.map(col): _*)

  def lastApplied(spark: SparkSession, path: String): Option[Long] =
    BucketStore.lastApplied(spark, path)

  def recover(spark: SparkSession, path: String): Unit =
    BucketStore.recover(spark, path)

  private def undoDir(path: String, batchId: Long): String =
    s"$path/_undo/batch=$batchId"

  /** Upsert the changed rows for `batchId`, touching only their buckets.
    * `changed` must be delta-sized (its bucket list is collected on the
    * driver) and carry the POST-batch values; rows for vertices absent
    * from the store are inserts. Idempotent per `batchId`: a replay of a
    * recorded batch is a no-op. */
  def upsert(spark: SparkSession, path: String, changed: DataFrame,
      nBuckets: Int, batchId: Long): Seq[Long] = {
    BucketStore.recover(spark, path)
    if (lastApplied(spark, path).exists(_ >= batchId))
      return Nil // already durably applied — replay after a crash
    val fs = BucketStore.fsFor(spark, path)

    val d = changed.select(COLS.map(col): _*)
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .localCheckpoint(true)
    val touched = d.select(BUCKET).distinct().collect()
      .map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) {
      BucketStore.writeApplied(fs, path, batchId)
      return touched
    }

    val existing = spark.read.parquet(path)
      .where(col(BUCKET).isInCollection(touched))
      .select(COLS.map(col): _*)

    // undo first (plain overwrite to its final path — it is only ever
    // consulted once `batchId` is recorded, which happens strictly
    // later): prior rows for changed keys + insert markers for new keys
    val keys = d.select("v")
    val prior = existing.join(broadcast(keys), Seq("v"), "left_semi")
      .withColumn("inserted", lit(false))
    val inserts = keys
      .join(existing.select("v"), Seq("v"), "left_anti")
      .select(col("v"), lit(0L).as("community"), lit(0L).as("subcomm"),
        lit(true).as("inserted"))
    prior.unionAll(inserts).write.mode("overwrite")
      .parquet(undoDir(path, batchId))
    // prune undo files two generations back (only the latest batch can
    // ever sit ahead of the engine checkpoint)
    val undoRoot = new Path(s"$path/_undo")
    if (fs.exists(undoRoot)) fs.listStatus(undoRoot).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch=") && n.stripPrefix("batch=").toLongOption
        .exists(_ < batchId - 1)) {
        val _ = fs.delete(st.getPath, true)
      }
    }

    // keyed upsert of the touched buckets: delta wins, others carried
    val merged = existing
      .join(broadcast(keys), Seq("v"), "left_anti")
      .unionAll(d.drop(BUCKET))
      .withColumn(BUCKET, bucketExpr(nBuckets))
      .localCheckpoint(true)

    merged.write.mode("overwrite").partitionBy(BUCKET)
      .parquet(BucketStore.stagingData(path))
    val surviving = merged.select(BUCKET).distinct().collect()
      .map(_.getLong(0)).toSet
    BucketStore.commitAndSwap(spark, path, touched, surviving,
      Some(batchId))
    touched
  }

  /** The PRE-batch assignment: the live table with `batchId`'s undo file
    * folded back over it (changed keys restored to their prior rows,
    * inserted keys dropped). Used when a crash left the store one batch
    * ahead of the committed engine checkpoint.
    *
    * A batch that changed ZERO rows records its applied marker but
    * writes no undo dir ([[upsert]]'s empty-touched fast path) — its
    * pre-batch view IS the live view. Surfaced in r6 when the persisted
    * upper composition made genuinely no-change warm batches possible. */
  def preView(spark: SparkSession, path: String, batchId: Long): DataFrame = {
    val live = read(spark, path)
    val undoPath = undoDir(path, batchId)
    val hasUndo = BucketStore.fsFor(spark, path)
      .exists(new org.apache.hadoop.fs.Path(undoPath))
    if (!hasUndo) return live
    val undo = spark.read.parquet(undoPath)
    live.join(broadcast(undo.select("v")), Seq("v"), "left_anti")
      .unionAll(undo.where(!col("inserted")).select(COLS.map(col): _*))
  }
}
