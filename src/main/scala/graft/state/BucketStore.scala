package graft.state

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared two-phase-commit protocol under every bucket-partitioned
  * durable store ([[graft.graph.BucketedEdges]] for the canonical edge
  * table, [[BucketedAssign]] for the assignment table).
  *
  * A merge stages its rewritten buckets under `_staging/data`, writes an
  * atomic `COMMIT` record naming the touched/surviving buckets (+ the
  * batch id), then swaps the staged buckets into the live table and
  * records the batch as applied under `_meta/applied_<id>`. Every step
  * after COMMIT is deterministic and idempotent, so [[recover]] can roll
  * a crash at any point forward (COMMIT present) or back (absent).
  *
  * Store-specific logic — what a "merge" means (signed weight sum vs
  * keyed upsert) — stays in the callers; only the commit protocol lives
  * here, so the crash-safety argument is made once.
  */
private[graft] object BucketStore {

  val BUCKET = "bucket"
  private val META = "_meta"
  private val STAGING = "_staging"

  def stagingData(path: String): String = s"$path/$STAGING/data"

  def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

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
  def writeApplied(fs: FileSystem, path: String, batchId: Long): Unit = {
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
      val staged = new Path(s"${stagingData(path)}/$BUCKET=$b")
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

  /** Phase 2: atomic COMMIT record (tmp + rename), the idempotent swap,
    * the applied marker, staging cleanup, and the session file-listing
    * refresh. The caller must already have staged every surviving bucket
    * under `_staging/data`. */
  def commitAndSwap(spark: SparkSession, path: String, touched: Seq[Long],
      surviving: Set[Long], batchId: Option[Long]): Unit = {
    val fs = fsFor(spark, path)
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
  }
}
