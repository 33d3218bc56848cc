package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, deterministic synth, header decode,
  * frame sampling shape, feature normalization. */
class MultimodalSpec extends SparkSpecBase {

  lazy val media = Multimodal.synthMedia(spark, 60).cache()

  test("synth is deterministic and kinds cycle") {
    assert(media.count() == 60)
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload"))
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds == Map("image" -> 20, "audio" -> 20, "video" -> 20))
    val a = media.select(sum(xxhash64(col("payload")) % 1000003))
      .collect()(0).getLong(0)
    val b = Multimodal.synthMedia(spark, 60).repartition(5)
      .select(sum(xxhash64(col("payload")) % 1000003)).collect()(0).getLong(0)
    assert(a == b)
  }

  test("decodeMeta parses the stub header for every row") {
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 60)
    assert(meta.forall(m => m.width >= 16 && m.height >= 16))
    assert(meta.filter(_.kind == "image").forall(_.duration_ms == 0))
    assert(meta.filter(_.kind != "image").forall(_.duration_ms >= 1000))
    assert(meta.forall(_.n_bytes >= 80))
  }

  test("frameSample emits every stride-th 32-byte block") {
    val frames = Multimodal.frameSample(media, stride = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    assert(frames.filter(_.frame_idx == 0).length == 60)
    // frame bytes match the payload slice for a spot-checked row
    val row = media.where(col("media_id") === 7).collect()(0)
    val body = row.getAs[Array[Byte]]("payload").drop(16)
    val f0 = frames.find(f => f.media_id == 7 && f.frame_idx == 0).get
    assert(f0.frame.sameElements(body.take(32)))
  }

  test("featureExtract emits unit-norm fixed-dim embeddings") {
    val feats = Multimodal.featureExtract(media, dim = 16).collect()
    assert(feats.length == 60)
    assert(feats.forall(_.embedding.length == 16))
    assert(feats.forall(f =>
      math.abs(f.embedding.map(x => x * x).sum - 1.0) < 1e-5))
    // deterministic: same media id -> same embedding
    val again = Multimodal.featureExtract(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(feats.forall(f => again(f.media_id) == f.embedding.toSeq))
  }
}
