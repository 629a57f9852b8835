package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native dot64 matches the HOF formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.register(spark)
    val df = Tables.load(spark, sf, "embeddings").limit(100)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val both = df.select(
      Similarity.dot($"e", $"e").as("native"),
      aggregate(zip_with($"e", $"e", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // corrupt-input edges must yield NULL (HOF parity): a truncated or
    // partially-null embedding drops out of rankings, never scores a
    // plausible prefix sum
    val edge = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0), Some(99.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val out = edge.select(Similarity.dot($"a", $"b")).collect()
    assert(out(0).isNullAt(0)) // length mismatch
    assert(out(1).isNullAt(0)) // null element
    assert(out(2).isNullAt(0)) // null array
    // and a clean pair still computes
    val ok = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(Similarity.dot($"a", $"b")).collect()
    assert(ok(0).getDouble(0) == 11.0)
  }

  test("brute-force top-k ranks a known geometry correctly") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
      (2L, Array(0.5f, 0.5f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)) // orthogonal to 0
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 3)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(top.map(_._2) == Seq(1L, 2L, 3L))
  }

  test("null cosine (zero-norm embedding) is excluded from ranking, " +
      "and an all-null query vanishes rather than emitting null-score rows") {
    // deliberate semantics pin (r16 advice): the topk_by aggregate
    // SKIPS null scores, where the row_number window it replaced would
    // have ranked them — a zero-norm corpus vector must not occupy a
    // rank slot, and a zero-norm QUERY (all its cosines null) must be
    // absent from the output entirely, not present with null scores
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (9L, Array(0.0f, 0.0f)) // zero norm → cosine null against everything
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs, k = 3)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSeq
    // 9 never appears as a neighbor...
    assert(!out.exists(_._3 == 9L), s"zero-norm vector ranked: $out")
    // ...nor as a query
    assert(!out.exists(_._1 == 9L), s"all-null query emitted rows: $out")
    // normal queries rank exactly the 2 non-null non-self neighbors
    assert(out.count(_._1 == 0L) == 2)
  }

  test("self-match excluded and ranks are dense per query") {
    val vecs = Tables.load(spark, sf, "embeddings")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" < 5), k = 5)
    assert(top.filter($"vec_id" === $"query_id").count() == 0)
    val ranks = top.groupBy("query_id").agg(collect_list("rank").as("rs"))
      .select("rs").as[Seq[Int]].collect()
    ranks.foreach(rs => assert(rs.sorted == (1 to 5)))
  }

  test("LSH ANN achieves usable recall vs brute force on real embeddings") {
    val vecs = Tables.load(spark, sf, "embeddings")
    val queries = vecs.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // These synthetic embeddings have weak neighbor structure (top-5
    // cosine ≈ 0.32 → per-bit collision ≈ 0.6): 4 bits × 8 tables gives
    // ~0.65 expected per-neighbor detection. Deterministic via the seed.
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, bits = 4, tables = 8)
    val approx = lsh.approxTopK(vecs, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.45, s"recall@5 = $recall")
    // approx returns at most k per query and never self-matches
    assert(!approx.exists { case (q, v) => q == v })
  }

  test("LSH at production strength reaches recall@5 ≥ 0.9 (sf0.01)") {
    // q23 runs a cheap 8-table config; this pins the QUALITY knob: the
    // same 4-bit geometry at 32 tables must reach production recall
    // (per-neighbor detection 1-(1-p^4)^32 ≈ 0.96+ even at the weak
    // p≈0.56 collision rate of this corpus's cos≈0.2 tail neighbors).
    val vecs = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = vecs.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, bits = 4, tables = 32)
    val approx = lsh.approxTopK(vecs, queries, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall at bits=4, tables=32")
  }

  test("cosine near-duplicates finds a planted duplicate vector") {
    val vecs = Tables.load(spark, sf, "embeddings")
    val planted = vecs.union(vecs.filter($"vec_id" === 7)
      .select(($"vec_id" + 1000).as("vec_id"), $"embedding", $"label"))
    val lsh = Similarity.RandomHyperplaneLsh(dim = 64, bits = 4, tables = 8)
    val dups = Similarity.cosineNearDuplicates(planted, lsh, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((7L, 1007L)))
  }
}
