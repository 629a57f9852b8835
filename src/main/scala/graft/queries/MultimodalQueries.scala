package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column pipeline as a driver-verifiable query: synthetic
  * binary media (real PNGs and WAVs from a deterministic generator) →
  * size-aware repartition → batched REAL decode (ImageIO pixels, RIFF
  * PCM samples; video stays a byte-histogram stub) → per-kind feature
  * statistics. Rows-only check: the corpus is generated Scala-side, so
  * no DuckDB oracle — determinism is what the driver can assert, and
  * the decode correctness (planted dims/channel means/sample rates) is
  * spec-covered in MultimodalSpec.
  */
object MultimodalQueries {

  def q29MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, 1000)
    val features = Multimodal.extractFeatures(
      Multimodal.repartitionForDecode(media, targetBytes = 256 * 1024))
    features.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1), 6).as("f0"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("f0")), 6).as("avg_f0"))
      .orderBy(col("kind"))
  }

  /** Near-duplicate IMAGE detection — the multimodal dedup a training
    * pipeline actually runs, composing the two real paths end-to-end:
    * REAL PNG bytes → REAL ImageIO decode
    * ([[Multimodal.extractFeatures]] → [[Multimodal.decodeImage]]) →
    * scale-free luma-histogram feature vector → LSH-bucketed cosine
    * near-dup ([[graft.similarity.Similarity.cosineNearDuplicates]],
    * no all-pairs). The corpus plants 24 originals with
    * pairwise-distinct two-tone histograms plus one ~2%-perturbed copy
    * of each ([[Multimodal.imageDedupCorpus]]); at threshold 0.99 the
    * result is exactly the 24 planted (original, copy) pairs —
    * perturbed copies found, unrelated images not (exactness
    * spec-pinned in ImageNearDupSpec). Rows-only driver check: the
    * pixels→features path is not SQL-expressible.
    */
  def q35ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.imageDedupCorpus(s, groups = 24)
    val features = Multimodal.extractFeatures(
      Multimodal.repartitionForDecode(media, targetBytes = 256 * 1024))
    // embedding = the 8-bin luma histogram (decodeImage f8..f15;
    // 1-indexed slice 9..16) — scale-free, so a perturbed copy stays
    // near-identical while distinct originals are near-orthogonal
    val vecs = features.toDF().select(
      col("media_id").as("vec_id"),
      slice(col("features"), 9, 8).as("embedding"))
    val lsh = graft.similarity.Similarity.RandomHyperplaneLsh(dim = 8, bits = 4, tables = 4)
    graft.similarity.Similarity.cosineNearDuplicates(vecs, lsh, threshold = 0.99)
      .withColumn("cosine_r6", round(col("cosine"), 6))
      .drop("cosine")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Perceptual-hash image near-dup — the crop/re-encode-robust twin
    * of q35 (whose luma HISTOGRAM carries no spatial structure: it
    * pairs any two images with the same tone mix and misses nothing a
    * recolor does): REAL PNG bytes → [[graft.multimodal.ImagePhash]]
    * DCT pHash (32×32 box-resampled luma → 2-D DCT-II → 8×8 block →
    * median-threshold 64 bits) → multi-index Hamming self-join
    * (8 × 8-bit chunks + 1-bit multi-probe, radius ≤ 15 guaranteed) →
    * exact popcount verify. The corpus plants 8 natural-image-like
    * fields with a 2×-resolution re-encode, a ~1% crop, and a ~0.5°
    * rotation of each ([[Multimodal.phashDedupCorpus]]): all planted
    * copies land ≤ 14 bits from their original, distinct fields ≥ 24
    * (ImageNearDupSpec pins both margins). Rows-only driver check:
    * pixels→DCT is not SQL-expressible.
    */
  def q204ImagePhashNearDup(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.ImagePhash
    val corpus = Multimodal.phashDedupCorpus(s, groups = 8)
    media.nearDuplicates(corpus)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Audio near-dup — the third face of the multimodal dedup triangle
    * (text simhash64 q22, image pHash q204, audio here; video stays
    * the declared no-JDK-codec stub): REAL 16-bit PCM WAV bytes →
    * [[graft.multimodal.AudioFingerprint]] energy-envelope fingerprint
    * (64 duration-proportional frames → per-frame RMS → sign of the
    * temporal energy delta, the Haitsma–Kalker shape at frame grain) →
    * the SAME multi-index Hamming search as q204
    * ([[graft.multimodal.MultiIndexHamming]], radius ≤ 15 guaranteed,
    * inline popcount verify). The corpus plants 8 clips with distinct
    * seeded envelopes plus a 2×-sample-rate re-encode, a −6 dB gain
    * copy, and a ~1%-noise copy of each
    * ([[graft.multimodal.Multimodal.audioDedupCorpus]]); planted
    * copies land within a few bits (gain-invariant energy ratios,
    * duration-proportional frames), distinct envelopes ~32 bits apart
    * (AudioNearDupSpec pins both margins). Rows-only driver check:
    * bytes→PCM→envelope is not SQL-expressible (the q35/q204
    * argument).
    */
  def q208AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    val corpus = Multimodal.audioDedupCorpus(s, groups = 8)
    graft.multimodal.AudioFingerprint.nearDuplicates(corpus)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Incremental pHash near-dup — the multimodal face of the q33/q34/
    * q40 incremental-index family: the original images' 64-bit codes
    * persist ONCE under the Warehouse (16 bytes/image, decoded once;
    * fingerprint-keyed like every other index — the planted corpus
    * itself is a pure function of its group count, so the anchor only
    * forces a rebuild on a testdata refresh), and the day-2 batch
    * (the re-encode/crop/rotate copies) decodes ONLY itself and probes
    * the stored codes via [[graft.multimodal.MultiIndexHamming
    * .searchAgainst]]. Equivalence to the batch q204 restricted to
    * (batch × index) pairs is spec-pinned (ImageNearDupSpec).
    * Rows-only driver check (the q204 argument).
    */
  def q210ImagePhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = Multimodal.phashDedupCorpus(s, groups = 8)
    val idx = graft.core.Warehouse.ensureBuilt(s,
      graft.core.Warehouse.derivedDir(s, "phash_index",
        s"$dir/documents.parquet", params = "plant8.v1")) { d =>
      graft.multimodal.ImagePhash.writeIndex(corpus.filter(_.media_id < 1000), d)
    }
    graft.multimodal.ImagePhash
      .nearDuplicatesAgainst(corpus.filter(_.media_id >= 1000), idx)
      .orderBy(col("probe_id"), col("index_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_features" -> (q29MultimodalFeatures _),
    "q35_image_neardup" -> (q35ImageNearDup _),
    "q204_image_phash_neardup" -> (q204ImagePhashNearDup _),
    "q208_audio_neardup" -> (q208AudioNearDup _),
    "q210_image_phash_incremental" -> (q210ImagePhashIncremental _))

  val oracleSql: Map[String, String] = Map.empty
}
