package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def bytes(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 251).toByte)

  def media = Seq(
    MediaRow(1, "image", bytes(1, 400), 20, 20, 0, 0),
    MediaRow(2, "image", bytes(1, 400), 20, 20, 0, 0), // exact dup of 1
    MediaRow(3, "image", bytes(3, 400), 20, 20, 0, 0),
    MediaRow(4, "audio", bytes(4, 800), 0, 0, 16000, 0),
    MediaRow(5, "video", bytes(5, 1200), 16, 16, 0, 6)).toDS()

  test("decode emits width×height pixels in [0,1], deterministic") {
    val imgs = decodeImages(spark, media).collect()
      .map(i => i.media_id -> i).toMap
    assert(imgs.keySet == Set(1L, 2L, 3L))
    assert(imgs(1L).pixels.length == 400)
    assert(imgs(1L).pixels.forall(p => p >= 0f && p <= 1f))
    // same content → same pixels; different content differs
    assert(imgs(1L).pixels.toSeq == imgs(2L).pixels.toSeq)
    assert(imgs(1L).pixels.toSeq != imgs(3L).pixels.toSeq)
  }

  test("resize keeps schema, changes shape") {
    val small = resize(spark, decodeImages(spark, media), 5, 4).collect()
    assert(small.forall(i => i.width == 5 && i.height == 4 &&
      i.pixels.length == 20))
  }

  test("feature extraction: fixed dim for every modality") {
    val feats = extractFeatures(spark, media, dim = 32).collect()
    assert(feats.length == 5)
    assert(feats.forall(_.embedding.length == 32))
    val byId = feats.map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(byId(1L) == byId(2L)) // dup payloads → identical embeddings
    assert(byId(1L) != byId(3L))
  }

  test("frame sampling: one row per sampled frame, chunked payload") {
    val frames = sampleFrames(spark, media, stride = 2).collect()
    assert(frames.map(_.media_id).distinct.toSeq == Seq(5L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.content.length == 200)) // 1200 / 6 frames
  }

  test("binary exact dedup finds the duplicate payload") {
    val groups = exactDupGroups(media.toDF())
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
  }

  test("embedding near-dup candidates surface the exact dup pair") {
    val cands = nearDupCandidates(spark, media, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }
}
