package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.SimHash64

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    2L -> "spark partitions shuffle data across executors for distributed joins and aggregates",
    3L -> "completely different text about gardening tomatoes in clay soil with compost",
    4L -> "neural networks approximate functions by composing linear maps and pointwise nonlinearities")

  // near-copies: one token appended / one token swapped
  private val nearCopies = Seq(
    101L -> "the quick brown fox jumps over the lazy dog near the river bank yesterday",
    102L -> "spark partitions shuffle data across executors for distributed joins and aggregates quickly")

  private lazy val docs = (base ++ nearCopies).toDF("doc_id", "text")

  test("minhash-lsh finds planted near-dups and nothing else at θ=0.5") {
    val pairs = MinHashLSH.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 101L), (2L, 102L)))
  }

  test("minhash candidate generation is bucket-local, not all-pairs") {
    val n = docs.count()
    val cands = MinHashLSH.candidatePairs(docs, "doc_id", "text").count()
    assert(cands < n * (n - 1) / 2, s"candidates=$cands look like all-pairs")
  }

  test("oversized band buckets degrade to min-id star pairs: a planted mega-bucket " +
      "keeps cluster-survivor semantics at O(s) pairs, normal pairs still surface, " +
      "and the default cap changes nothing here") {
    // 40 exact copies of one boilerplate text → every band bucket they
    // occupy has width 40; with maxBucket=8 their pairs degrade to the
    // min-id star (1000, i) — 39 pairs, all verifying at J=1 — instead
    // of either the full 780 or (the pre-r17 bug) zero, while the
    // planted normal near-dup pairs keep their width-2 buckets
    val boiler = (1000L until 1040L).map(i =>
      i -> "identical boilerplate footer text repeated across every single page of the site")
    val mixed = (base ++ nearCopies ++ boiler).toDF("doc_id", "text")
    val star = (1001L until 1040L).map(i => (1000L, i)).toSet
    val capped = MinHashLSH.nearDuplicates(mixed, "doc_id", "text",
      threshold = 0.5, maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 101L), (2L, 102L)) ++ star,
      s"expected normal pairs + the 39-star, got ${capped.size}")
    // candidate volume is bounded by the cap (stars are linear in the
    // bucket width), not by the 40² mega-bucket
    val cands = MinHashLSH.candidatePairs(mixed, "doc_id", "text", maxBucket = 8).count()
    assert(cands < 40L * 39 / 2, s"candidates=$cands include mega-bucket pairs")
    // cluster-survivor semantics survive the degrade: the whole 40-copy
    // cluster resolves to ONE component around its min id
    val comp = DedupClusters.components(
        MinHashLSH.nearDuplicates(mixed, "doc_id", "text",
          threshold = 0.5, maxBucket = 8).select("id_a", "id_b"))
      .filter($"component" === 1000L).count()
    assert(comp == 40L, s"mega-bucket cluster fragmented: $comp of 40 members")
    // at the default cap the mega-bucket fits and all pairs return
    val full = MinHashLSH.nearDuplicates(mixed, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full.size == 2 + 40 * 39 / 2, s"default cap lost pairs: ${full.size}")
  }

  test("jaccard verification is exact") {
    val a = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    // 3-shingles: {abc,bcd,cde} vs {abc,bcd,cdf} → J = 2/4 = 0.5.
    // r=1 bands (k=b=16) make the detection probability at J=0.5
    // 1-(1-0.5)^16 ≈ 1, so the pair reliably becomes a candidate and
    // the exact-jaccard verifier is what's under test.
    val j = MinHashLSH.nearDuplicates(a, "doc_id", "text", threshold = 0.4,
      n = 3, k = 16, b = 16)
      .select("jaccard").as[Double].collect()
    assert(j.toSeq == Seq(0.5))
  }

  test("relational shingleRows set-equals the array wordShingles form") {
    import org.apache.spark.sql.functions._
    val weird = docs.union(Seq(
      (50L, ""), (51L, "one"), (52L, "two words"), (53L, "exactly three tokens"),
      (54L, "dup dup dup dup")).toDF("doc_id", "text"))
    val viaArray = weird
      .select($"doc_id", explode(MinHashLSH.wordShingles($"text", 3)).as("sh"))
      .as[(Long, String)].collect().toSet
    val viaRows = MinHashLSH.shingleRows(weird, "doc_id", "text", 3)
      .as[(Long, String)].collect().toSet // dups allowed; compare as sets
    assert(viaRows == viaArray)
  }

  test("simhash expression matches the reference implementation and codegen runs") {
    SimHash64.register(spark)
    val out = docs.select(col("doc_id"), SimHash64.simhash64(col("text")))
      .as[(Long, Long)].collect().toMap
    base.foreach { case (id, text) =>
      assert(out(id) == SimHash64.hash(text))
    }
    // deterministic + case/whitespace normalization inside hash
    assert(SimHash64.hash("A  b") == SimHash64.hash("a b"))
  }

  test("simhash near-dup: identical docs at distance 0, appended-token within 3 bits") {
    SimHash64.register(spark)
    val planted = docs.union(
      docs.filter($"doc_id" === 3L).select($"doc_id" + 200, $"text"))
    val pairs = SimHashDedup.nearDuplicates(planted, "doc_id", "text")
      .select("id_a", "id_b", "hamming_dist")
      .as[(Long, Long, Int)].collect()
    val exact = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(exact.contains((3L, 203L)))
    // the one-token variants are long docs → tiny vote flips; they may or
    // may not land within 3 bits, but no unrelated pair may
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(!ids.contains((1L, 2L)) && !ids.contains((3L, 4L)))
  }

  test("simhash guard rejects banding-unsafe distance") {
    SimHash64.register(spark)
    intercept[IllegalArgumentException] {
      SimHashDedup.nearDuplicates(docs, "doc_id", "text", maxDist = 10)
    }
  }
}
