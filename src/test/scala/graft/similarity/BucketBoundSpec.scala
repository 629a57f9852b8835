package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.SimHashDedup

/** Evidence for the DELIBERATELY-uncapped bucket joins
  * ([[Similarity.cosineNearDuplicates]], [[SimHashDedup]]) — the r16
  * verdict asked for the in-file prose argument to become a regression
  * gate. Two claims are pinned against a planted worst-case collision
  * cluster:
  *
  *  1. Exactness: a cluster of identical items shares EVERY bucket, so
  *     a width cap would drop exactly the duplicate-heaviest content —
  *     all cluster pairs must surface (the q32/q34/q22 guarantee).
  *  2. The scale lever is `bits` (∝ log N), not a cap: measured
  *     candidate-pair volume from background (non-cluster) collisions
  *     falls geometrically as bits grow, while the planted cluster's
  *     contribution stays fixed at tables · m(m−1)/2 — bounded by the
  *     CLUSTER's size, which is the work any dedup must do for it.
  */
class BucketBoundSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private val clusterSize = 30
  private val background = 400

  /** Seeded corpus: `background` random unit-ish vectors plus a planted
    * cluster of `clusterSize` identical copies of one vector.
    */
  private lazy val vecs = {
    val rnd = new scala.util.Random(7L)
    def v() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0 until background).map(i => (i.toLong, v()))
    val c = v()
    val cluster = (0 until clusterSize).map(i => (1000L + i, c.clone()))
    (base ++ cluster).toDF("vec_id", "embedding")
  }

  /** Self-join candidate-pair volume the bucket join would perform:
    * Σ over (table, bucket) of s(s−1)/2.
    */
  private def pairVolume(lsh: Similarity.RandomHyperplaneLsh): Long =
    lsh.bucketed(vecs)
      .groupBy($"lsh_table", $"lsh_bucket").agg(count(lit(1)).as("s"))
      .select(sum($"s" * ($"s" - 1)))
      .as[Long].head() / 2

  test("planted identical cluster: every pair survives the uncapped cosine bucket join") {
    val lsh = Similarity.RandomHyperplaneLsh(dim, bits = 10, tables = 2)
    val pairs = Similarity.cosineNearDuplicates(vecs, lsh, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 1000L until (1000L + clusterSize)
      b <- (a + 1) until (1000L + clusterSize)
    } yield (a, b)).toSet
    assert(expected.subsetOf(pairs),
      s"cluster pairs lost: ${(expected -- pairs).size} of ${expected.size}")
  }

  test("bits is the scale lever: background candidate volume falls geometrically " +
      "with bits while the cluster's stays fixed") {
    val tables = 2
    // the cluster contributes exactly tables · m(m−1)/2 at ANY bits —
    // identical vectors collide in every table regardless of resolution
    val clusterVolume = tables.toLong * clusterSize * (clusterSize - 1) / 2
    val volByBits = Seq(2, 6, 10).map { bits =>
      val v = pairVolume(Similarity.RandomHyperplaneLsh(dim, bits, tables))
      assert(v >= clusterVolume, s"bits=$bits lost cluster collisions: $v")
      bits -> (v - clusterVolume)
    }.toMap
    info(s"background candidate volume by bits (N=$background, tables=$tables): $volByBits")
    // expectation is N²/2^bits per table; allow generous slack for the
    // non-uniform gaussian bucket distribution but pin the geometric
    // decay — +4 bits must at least halve the background volume
    assert(volByBits(6) * 2 <= volByBits(2),
      s"bits 2→6 did not halve background volume: $volByBits")
    assert(volByBits(10) * 2 <= volByBits(6),
      s"bits 6→10 did not halve background volume: $volByBits")
  }

  test("simhash: the wide chunk bucket IS the duplicate cluster — all pairs kept, " +
      "candidate volume bounded by 4·m(m−1)/2 for the cluster") {
    val boiler = (0 until 25).map(i =>
      (2000L + i) -> "identical boilerplate footer text repeated across every single page")
    val distinct = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      2L -> "spark partitions shuffle data across executors for distributed joins",
      3L -> "completely different text about gardening tomatoes in clay soil")
    val docs = (distinct ++ boiler).toDF("doc_id", "text")
    val pairs = SimHashDedup.nearDuplicates(docs, "doc_id", "text")
      .filter($"hamming_dist" === 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 2000L until 2025L; b <- (a + 1) until 2025L
    } yield (a, b)).toSet
    assert(expected.subsetOf(pairs), s"cluster pairs lost: ${(expected -- pairs).size}")
    // candidate volume from the cluster's 4 shared chunk buckets is
    // exactly 4 · m(m−1)/2 — linear in chunk count, quadratic only in
    // the CLUSTER size (the work its dedup inherently costs)
    val vol = SimHashDedup.chunkedDocs(docs, "doc_id", "text")
      .groupBy($"chunk_idx", $"chunk_value").agg(count(lit(1)).as("s"))
      .select(sum($"s" * ($"s" - 1))).as[Long].head() / 2
    assert(vol == 4L * 25 * 24 / 2,
      s"unexpected extra chunk collisions: volume=$vol")
  }
}
