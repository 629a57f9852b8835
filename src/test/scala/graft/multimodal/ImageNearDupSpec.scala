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
}
