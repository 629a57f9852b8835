package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.Similarity

/** Multimodal → similarity integration (q35 surface): near-duplicate
  * images are found through the REAL byte path — planted
  * perturbed-pixel copies pair with their originals, unrelated images
  * pair with nothing.
  */
class ImageNearDupSpec extends SparkTestBase {
  import spark.implicits._

  test("image near-dup finds exactly the planted perturbed copies") {
    val groups = 24
    val media = Multimodal.imageDedupCorpus(spark, groups)
    val features = Multimodal.extractFeatures(media)
    val vecs = features.toDF().select(
      col("media_id").as("vec_id"),
      slice(col("features"), 9, 8).as("embedding"))
    val lsh = Similarity.RandomHyperplaneLsh(dim = 8, bits = 4, tables = 4)
    val pairs = Similarity.cosineNearDuplicates(vecs, lsh, threshold = 0.99)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .as[(Long, Long, Double)].collect()

    // exactly the planted (original, copy) pairs — nothing else
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0 until groups).map(i => (i.toLong, 1000L + i)).toSet)
    // a 2%-of-pixels perturbation stays deep inside the threshold
    assert(pairs.forall(_._3 > 0.995))
  }

  test("the feature path is the real decoder, not metadata: histograms sum to 1") {
    val media = Multimodal.imageDedupCorpus(spark, 4)
    val rows = Multimodal.extractFeatures(media).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val hist = r.features.slice(8, 16)
      assert(math.abs(hist.sum - 1f) < 1e-4, s"media ${r.media_id}: ${hist.toSeq}")
      // two-tone originals concentrate mass in exactly 2 bins (the
      // perturbed copies leak ~2% into a third)
      assert(hist.count(_ > 0.01f) <= 3)
    }
  }

  test("distinct originals are far apart: no pair without a planted copy qualifies") {
    val groups = 24
    val media = Multimodal.imageDedupCorpus(spark, groups)
      .filter(col("media_id") < 1000) // originals only
    val vecs = Multimodal.extractFeatures(media).toDF().select(
      col("media_id").as("vec_id"),
      slice(col("features"), 9, 8).as("embedding"))
    val lsh = Similarity.RandomHyperplaneLsh(dim = 8, bits = 4, tables = 4)
    assert(Similarity.cosineNearDuplicates(vecs, lsh, threshold = 0.99).isEmpty)
  }

  // ===== DCT pHash (ImagePhash): the crop/re-encode/rotate twin =========

  test("pHash finds every planted re-encode/crop/rotate copy; no cross-group pair") {
    val groups = 8
    val pairs = ImagePhash.nearDuplicates(Multimodal.phashDedupCorpus(spark, groups))
      .as[(Long, Long, Int)].collect()
    def group(id: Long) = id % 1000
    // every (original, perturbed-copy) pair surfaces, all three kinds
    val planted = (0 until groups).flatMap(g =>
      Seq((g.toLong, 1000L + g), (g.toLong, 2000L + g), (g.toLong, 3000L + g))).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(found),
      s"planted copies missed: ${planted -- found}")
    // nothing pairs across groups — distinct fields sit >= 24 bits apart
    assert(pairs.forall(p => group(p._1) == group(p._2)),
      s"cross-group pairs: ${pairs.filter(p => group(p._1) != group(p._2)).toSeq}")
    // the margin is real: copies within 14 bits, radius 15 not strained
    assert(pairs.filter(p => planted((p._1, p._2))).forall(_._3 <= 14),
      "a planted copy needed more than 14 bits")
  }

  test("pHash separates what the histogram path cannot: same tone mix, different structure") {
    // two images with IDENTICAL luma histograms but different spatial
    // layout: mass split across the same two tones, arranged as
    // left/right halves vs horizontal stripes
    def png(stripes: Boolean) = Multimodal.encodePng(64, 64, (x, y) => {
      val dark = if (stripes) (y / 8) % 2 == 0 else x < 32
      val v = if (dark) 64 else 192
      (v << 16) | (v << 8) | v
    })
    val h1 = Multimodal.decodeImage(png(stripes = false)).get.slice(8, 16)
    val h2 = Multimodal.decodeImage(png(stripes = true)).get.slice(8, 16)
    assert(h1.toSeq == h2.toSeq, "histograms should be identical by construction")
    val d = java.lang.Long.bitCount(
      ImagePhash.phash64(png(stripes = false)).get ^
        ImagePhash.phash64(png(stripes = true)).get)
    assert(d > ImagePhash.MaxDistance,
      s"pHash must separate structurally different images: dist $d")
  }

  test("incremental pHash probe ≡ batch near-dup restricted to (batch × index)") {
    val corpus = Multimodal.phashDedupCorpus(spark, 8)
    val idx = java.nio.file.Files.createTempDirectory("phash-idx").toString + "/codes"
    ImagePhash.writeIndex(corpus.filter(_.media_id < 1000), idx)
    val incremental = ImagePhash
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // batch pairs are (id_a < id_b); the cross slice maps to
    // (probe = copy, index = original)
    val batchCross = ImagePhash.nearDuplicates(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(p => p._1 < 1000 && p._2 >= 1000)
      .map(p => (p._2, p._1, p._3)).toSet
    assert(incremental == batchCross,
      s"incremental vs batch-cross: ${incremental.diff(batchCross)} / ${batchCross.diff(incremental)}")
    assert(incremental.nonEmpty)
  }

  test("pHash multi-probe radius is honest: a 15-bit-away hash is found, 16 is not promised") {
    // synthetic direct check of the chunk join on hand-made hashes
    import org.apache.spark.sql.functions.{col => c}
    val base = 0x0123456789abcdefL
    def flipLow(h: Long, n: Int): Long = {
      var out = h; var i = 0
      while (i < n) { out ^= (1L << (i * 4)); i += 1 } // spread flips
      out
    }
    val ph = Seq((1L, base), (2L, flipLow(base, 15))).toDF("media_id", "phash")
    val found = ImagePhash.chunked(ph, probe = true)
      .select(c("chunk_idx"), c("chunk_value"), c("media_id").as("id_a"), c("phash").as("ph_a"))
      .join(ImagePhash.chunked(ph).select(c("chunk_idx"), c("chunk_value"),
        c("media_id").as("id_b"), c("phash").as("ph_b")),
        Seq("chunk_idx", "chunk_value"))
      .filter(c("id_a") < c("id_b")).count()
    assert(found > 0, "15-bit pair must collide in some probed chunk")
  }
}
