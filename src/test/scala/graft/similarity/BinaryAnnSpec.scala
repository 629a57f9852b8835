package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorOps

/** Binary-quantized ANN: packing layout pinned bit-for-bit, native
  * hamming64 semantics (count + strictness), the planted-copy
  * guarantee (identical vectors are Hamming-0 and must surface at
  * rank 1), and MEASURED recall against the exact brute-force answer
  * on the natural corpus — quality is a number here, not a hope.
  */
class BinaryAnnSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("packSignBits: little-endian 32-bit blocks, ragged tail stays zero") {
    VectorOps.register(spark)
    val out = Seq(
      (1L, Seq(1.0, -1.0, 0.0, 2.0, -3.0)),             // bits 0,3 -> 9, one word
      (2L, (0 until 64).map(i =>
        if (i == 0 || i == 31 || i == 32 || i == 63) 1.0 else -1.0)))
      .toDF("id", "e")
      .select($"id", BinaryAnn.packSignBits($"e").as("bits"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(9L), s"got ${out(1L)}")
    assert(out(2L) == Seq(2147483649L, 2147483649L), s"got ${out(2L)}")
  }

  test("hamming64: popcount of xor; NULL on length mismatch") {
    VectorOps.register(spark)
    val d = Seq((Seq(10L, 6L), Seq(6L, 6L)), (Seq(1L), Seq(1L, 2L)))
      .toDF("a", "b")
      .select(VectorOps.hamming64($"a", $"b").as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    // 10^6 = 0b1100 -> 2 bits; second word equal -> 0
    assert(d == Seq(Some(2), None), s"got $d")
  }

  test("planted exact copies surface at rank 1 with hamming 0, cosine 1") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = vecs.union(
      vecs.select(($"vec_id" + 1000000).as("vec_id"), $"embedding"))
    val queries = vecs.filter($"vec_id" < 20)
    val top1 = BinaryAnn.hammingTopK(planted, queries, k = 5, candidates = 32)
      .filter($"rank" === 1)
      .select($"query_id", $"vec_id", $"hamming", round($"cosine", 9).as("c"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(top1.size == 20)
    top1.foreach { case (q, v, h, c) =>
      assert(v == q + 1000000 && h == 0L && c == 1.0, s"query $q got ($v, $h, $c)")
    }
  }

  private def recallAt5(dir: String, candidates: Int): Double = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = vecs.filter($"vec_id" < 50)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = BinaryAnn.hammingTopK(vecs, queries, k = 5, candidates = candidates)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    (exact & approx).size.toDouble / exact.size
  }

  test("recall@5 vs exact brute force ≥ 0.5 at the q85 test knob C=32 (measured 0.56)") {
    val recall = recallAt5(sf, candidates = 32)
    assert(recall >= 0.5, s"recall@5 = $recall")
  }

  test("at production strength C=256, recall@5 ≥ 0.9 (sf0.01, measured 0.996)") {
    // the LSH/IVF family standard: the production knob is pinned at the
    // family bound, not the test knob's looser one. Measured curve
    // (sf0.01): C=64 → 0.79, C=128 → 0.91, C=192 → 0.96, C=256 → 0.996.
    val recall = recallAt5("/root/testdata/sf0.01", candidates = 256)
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("search from a persisted code index equals the fresh-pack path") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = vecs.filter($"vec_id" < 20)
    val idx = java.nio.file.Files.createTempDirectory("bann-idx").toString
    BinaryAnn.buildIndex(vecs, idx)
    val fresh = BinaryAnn.hammingTopK(vecs, queries, k = 5, candidates = 32)
      .collect().map(_.toSeq).toSet
    val loaded = BinaryAnn.hammingTopKFromIndex(idx, vecs, queries, k = 5, candidates = 32)
      .collect().map(_.toSeq).toSet
    assert(loaded == fresh)
    // the probe plan reads the stored codes, not a re-pack: no
    // shiftleft (the packing kernel) may appear on the candidate side
    val p = BinaryAnn.hammingTopKFromIndex(idx, vecs, queries, k = 5, candidates = 32)
      .queryExecution.executedPlan.toString
    assert(p.contains(idx), "stored code table not scanned")
  }

  test("null hamming (null or length-mismatched embedding) drops out of the " +
      "candidate cut instead of ranking first") {
    // deliberate semantics pin (r16 advice): the topk_by Hamming cut
    // SKIPS null distances, where the asc row_number window it replaced
    // ranked nulls FIRST — a corrupt corpus row must not eat a
    // candidate slot (or worse, rank as everyone's nearest neighbor)
    val vecs = Seq(
      (0L, Array(1.0f, -1.0f)),
      (1L, Array(1.0f, -0.5f)),
      (2L, Array(-1.0f, 1.0f)),
      (9L, null.asInstanceOf[Array[Float]]) // null embedding → null bits → null hamming
    ).toDF("vec_id", "embedding")
    val out = BinaryAnn.hammingTopK(vecs, vecs.filter($"vec_id" === 0), k = 3, candidates = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(!out.exists(_._2 == 9L), s"null-embedding row ranked: $out")
    assert(out.map(_._2).toSet == Set(1L, 2L))
  }

  test("candidates < k is rejected") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    intercept[IllegalArgumentException] {
      BinaryAnn.hammingTopK(vecs, vecs.limit(1), k = 10, candidates = 5)
    }
  }
}
