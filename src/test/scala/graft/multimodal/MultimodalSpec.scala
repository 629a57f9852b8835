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
  }

  test("image features come from the actual PNG bytes: dims match metadata") {
    val imgs = media.filter(_.kind == "image")
    val meta = imgs.collect().map(m => m.media_id -> m).toMap
    val feats = Multimodal.extractFeatures(imgs).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val m = meta(f.media_id)
      assert(f.features(0) == m.width.toFloat, s"width of ${f.media_id}")
      assert(f.features(1) == m.height.toFloat, s"height of ${f.media_id}")
      assert(f.features(2) == 3f) // RGB bands
    }
  }

  test("planted solid-color PNG decodes to exact channel means") {
    // 40×30 all-red: meanR=1, meanG=0, meanB=0, luma=299/1000
    val png = Multimodal.encodePng(40, 30, (_, _) => 0xFF0000)
    val f = Multimodal.decodeImage(png).get
    assert(f(0) == 40f && f(1) == 30f)
    assert(math.abs(f(3) - 1f) < 1e-6 && f(4) == 0f && f(5) == 0f)
    assert(math.abs(f(6) - 0.299f) < 1e-3)
    assert(math.abs(f(7) - 40f / 30f) < 1e-6)
    // luminance histogram: all pixels in one bin (luma 76 → bin 2)
    assert(f(8 + 2) == 1f && (0 until 8).filter(_ != 2).forall(i => f(8 + i) == 0f))
  }

  test("wav features come from the actual RIFF bytes: rate, duration, channels") {
    val samples = Array.tabulate(8000)(j => (math.sin(2 * math.Pi * 440 * j / 8000) * 16000).toShort)
    val f = Multimodal.decodeWav(Multimodal.encodeWavMono(8000, samples)).get
    assert(f(0) == 1f) // mono
    assert(f(1) == 8000f) // sample rate
    assert(math.abs(f(2) - 1f) < 1e-6) // exactly one second
    // sine RMS = amplitude/√2, normalized by 2^15
    assert(math.abs(f(3) - (16000 / math.sqrt(2) / 32768)) < 1e-3)
    assert(math.abs(f(4) - 16000f / 32768) < 1e-3) // peak
    assert(math.abs(f(5)) < 1e-3) // zero-mean
    // 440 Hz crosses zero 880 times per second
    assert(math.abs(f(6) - 880f / 8000) < 1e-3)
  }

  test("corrupt payloads degrade to the byte-histogram fallback, never throw") {
    val junk = Array.tabulate(100)(_.toByte)
    assert(Multimodal.decodeBytes("image", junk).toSeq == Multimodal.byteHistogram(junk).toSeq)
    assert(Multimodal.decodeBytes("audio", junk).toSeq == Multimodal.byteHistogram(junk).toSeq)
    assert(Multimodal.decodeBytes("image", Array.empty[Byte]).length == Multimodal.FeatureDim)
  }

  test("resize re-encodes images under the byte cap with real halved dimensions") {
    val big = media.filter(m => m.kind == "image" && m.content.length > 1024)
    assert(big.count() > 0)
    val resized = Multimodal.resize(big, maxBytes = 1024).collect()
    resized.foreach { m =>
      assert(m.content.length <= 1024, s"media ${m.media_id} still ${m.content.length}B")
      // still a real decodable PNG whose dims match the updated metadata
      val f = Multimodal.decodeImage(m.content).get
      assert(f(0) == m.width.toFloat && f(1) == m.height.toFloat)
    }
    // small payloads pass through untouched
    val small = media.filter(m => m.content.length <= 256).collect()
    val untouched = Multimodal.resize(media.filter(m => m.content.length <= 256), 256).collect()
      .map(m => m.media_id -> m.content.toSeq).toMap
    small.foreach(m => assert(untouched(m.media_id) == m.content.toSeq))
  }

  test("frame sampling yields one row per sampled frame of videos only") {
    val frames = Multimodal.frameSampleStub(media, everyMs = 1000, frameBytes = 32)
    val kinds = media.collect().filter(_.kind == "video")
    val expected = kinds.map(m => math.max(1, (m.duration_ms / 1000).toInt)).sum
    assert(frames.count() == expected)
    assert(frames.select("frame_bytes").as[Array[Byte]].collect()
      .forall(_.length <= 32))
  }

  test("video metadata matches the actual mp4 payload: mvhd duration and track count") {
    val vids = media.filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    vids.foreach { m =>
      val meta = Mp4Boxes.parse(m.content).get
      assert(meta.duration * 1000L / meta.timescale == m.duration_ms,
        s"media ${m.media_id}: payload duration disagrees with metadata")
      assert(meta.majorBrand == "isom" && meta.nTracks == 1 + (m.media_id % 2).toInt)
    }
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
