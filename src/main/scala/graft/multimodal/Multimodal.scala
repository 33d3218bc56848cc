package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY payloads with typed metadata.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch-shaped
  * per-partition processing (the Scala analog of a batched pandas UDF:
  * `Dataset.mapPartitions` over case classes, amortizing per-batch setup
  * across an iterator), pushdown-friendly metadata columns. The *codec*
  * itself is a STUB: no image/audio libraries exist in this environment,
  * so payloads carry a deterministic 16-byte fake header
  * ("GRFT" magic, kind, width, height, duration) that decodeMeta parses
  * the way a real decoder would parse a JPEG/WAV header, and
  * featureExtract emits a deterministic hash-derived embedding where a
  * real model would run inference.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, width: Int,
      height: Int, duration_ms: Int, n_bytes: Long)
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])
  case class Feature(media_id: Long, embedding: Array[Float])

  val MAGIC: Array[Byte] = "GRFT".getBytes("UTF-8")

  /** Deterministic synthetic media table (seeded; no external data). */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 16 + (mix(i, seed, 1) & 0xFF).toInt
      val h = 16 + (mix(i, seed, 2) & 0xFF).toInt
      val dur = if (kind == "image") 0 else 1000 + (mix(i, seed, 3) & 0xFFFF).toInt
      val bodyLen = 64 + (mix(i, seed, 4) & 0x3FF).toInt
      val buf = java.nio.ByteBuffer.allocate(16 + bodyLen)
      buf.put(MAGIC).put(kindByte(kind))
        .put(0.toByte).putShort(w.toShort).putShort(h.toShort)
        .putInt(dur).put(0.toByte)
      var j = 0
      while (j < bodyLen) { buf.put((mix(i, seed, 5 + j) & 0xFF).toByte); j += 1 }
      MediaRow(i, kind, buf.array())
    }).toDF()
  }

  /** Header decode — the stubbed codec step. Batch-shaped: one buffer
    * reused per partition, not per row. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val bb = java.nio.ByteBuffer.wrap(r.payload)
          val magic = new Array[Byte](4); bb.get(magic)
          require(java.util.Arrays.equals(magic, MAGIC), "bad media header")
          bb.get(); bb.get()
          MediaMeta(r.media_id, r.kind, bb.getShort.toInt, bb.getShort.toInt,
            bb.getInt, r.payload.length.toLong)
        }
      }
  }

  /** Fixed-size frame sampling from the payload body: every `stride`-th
    * 32-byte block. Real video would decode frames; the slicing/explode
    * shape (one row in, k rows out, no driver involvement) is the same. */
  def frameSample(media: DataFrame, stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .flatMap { r =>
        val body = r.payload.drop(16)
        body.grouped(32).zipWithIndex
          .filter { case (_, idx) => idx % stride == 0 }
          .map { case (b, idx) => Frame(r.media_id, idx, b) }
      }
  }

  /** Deterministic fake feature extraction (stands in for model
    * inference): 16-dim embedding from rolling byte hashes. */
  def featureExtract(media: DataFrame, dim: Int = 16): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val emb = new Array[Float](dim)
          var i = 0
          while (i < r.payload.length) {
            val d = i % dim
            emb(d) += ((r.payload(i) & 0xFF) - 128) / 128.0f
            i += 1
          }
          val n = math.sqrt(emb.map(x => x * x).sum).toFloat max 1e-9f
          Feature(r.media_id, emb.map(_ / n))
        }
      }
  }

  private def kindByte(kind: String): Byte = kind match {
    case "image" => 1; case "audio" => 2; case _ => 3
  }

  /** splitmix64-style deterministic byte source. */
  private def mix(i: Long, seed: Long, salt: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L + seed * 0xBF58476D1CE4E5B9L +
      salt * 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
