package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 200).cache()

  test("feature extraction: fixed dim, deterministic, distributed") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 200)
    assert(feats.forall(_.features.length == Multimodal.FeatureDim))
    // deterministic: same payload → same features across runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.features.toSeq))
    // stub histogram is normalized
    feats.filter(_.n_bytes > 0)
      .foreach(f => assert(math.abs(f.features.sum - 1f) < 1e-3))
  }

  test("resize stub caps payload size and passes small payloads through") {
    val resized = Multimodal.resizeStub(media, maxBytes = 256).collect()
    assert(resized.forall(_.content.length <= 256))
    val small = media.filter(_.content.length <= 256).collect().map(_.media_id).toSet
    val untouched = resized.filter(m => small(m.media_id))
    val orig = media.collect().map(m => m.media_id -> m.content.toSeq).toMap
    untouched.foreach(m => assert(m.content.toSeq == orig(m.media_id)))
  }

  test("frame sampling yields one row per sampled frame of videos only") {
    val frames = Multimodal.frameSampleStub(media, everyMs = 1000, frameBytes = 32)
    val kinds = media.collect().filter(_.kind == "video")
    val expected = kinds.map(m => math.max(1, (m.duration_ms / 1000).toInt)).sum
    assert(frames.count() == expected)
    assert(frames.select("frame_bytes").as[Array[Byte]].collect()
      .forall(_.length <= 32))
  }

  test("size-aware repartition handles an empty dataset") {
    val none = media.filter(_.kind == "no_such_kind")
    assert(Multimodal.repartitionForDecode(none, 1 << 20).count() == 0)
  }

  test("size-aware repartition spreads payload bytes, not row counts") {
    val parts = Multimodal.repartitionForDecode(media, targetBytes = 64 * 1024)
      .rdd.getNumPartitions
    val total = media.collect().map(_.content.length.toLong).sum
    assert(parts == math.max(1, math.ceil(total / 65536.0).toInt))
  }
}
