package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Metadata-filtered binary ANN (q218 surface): predicate BEFORE the
  * candidate cut equals exact filtered search on a planted corpus
  * where post-filter-after-cut provably under-returns, and the
  * predicate reaches the decorated code scan as a parquet pushdown
  * with the bounded `topk_by` cut intact.
  */
class FilteredAnnSpec extends SparkTestBase {
  import spark.implicits._

  /** Planted skew: the query (id 0, label 0) is surrounded by 60
    * near-identical label-0 vectors; the 10 label-3 vectors all point
    * FAR away (negative first coordinate). Any global Hamming top-32
    * cut is saturated by label-0 — a post-filter keeps 0 label-3 rows
    * while 10 qualifying rows exist.
    */
  private def planted = {
    val dim = 8
    def vec(seed: Int, flip: Boolean): Seq[Float] =
      (0 until dim).map { d =>
        // strictly positive components: every label-0 vector shares the
        // query's sign pattern exactly (Hamming 0), every flipped
        // label-3 vector differs in all dim bits (Hamming = dim)
        val base = if (d == 0) 1.0f else 0.005f * ((seed * 7 + d * 3) % 9 + 1)
        if (flip) -base else base
      }
    val query = Seq((0L, vec(0, flip = false), 0))
    val crowd = (1L to 60L).map(i => (i, vec(i.toInt, flip = false), 0))
    val slice = (101L to 110L).map(i => (i, vec(i.toInt, flip = true), 3))
    (query ++ crowd ++ slice).toDF("vec_id", "embedding", "label")
  }

  test("pre-filter returns k within the slice where post-filter-after-cut returns zero") {
    val corpus = planted
    val idx = Files.createTempDirectory("filtered-ann").toString
    BinaryAnn.buildDecoratedIndex(corpus, idx, Seq("label"))
    val queries = corpus.filter($"vec_id" === 0L)

    // the broken ordering: global cut first, predicate after
    val global = BinaryAnn.hammingTopKFromIndex(idx, corpus, queries,
      k = 32, candidates = 32)
    val labels = corpus.select($"vec_id", $"label")
    val postFiltered = global.join(labels, Seq("vec_id")).filter($"label" === 3)
    assert(postFiltered.count() == 0,
      "fixture must saturate the global cut with label-0 (else the test proves nothing)")

    // the correct ordering: predicate before the cut
    val pre = BinaryAnn.filteredHammingTopKFromIndex(idx, corpus, queries,
      $"label" === 3, k = 5, candidates = 32)
    val got = pre.select($"vec_id").as[Long].collect().toSet
    assert(got.size == 5 && got.subsetOf((101L to 110L).toSet),
      s"pre-filter must return k=5 slice members, got $got")

    // and it equals EXACT search restricted to the slice (cut is
    // lossless here: the slice is smaller than the candidate budget)
    val exact = Similarity.bruteForceTopK(
        corpus.filter($"label" === 3), queries, k = 5)
      .select($"query_id", $"rank", $"vec_id")
      .as[(Long, Int, Long)].collect().toSet
    val preRanked = pre.select($"query_id", $"rank", $"vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(preRanked == exact, s"filtered ANN != exact slice search:\n$preRanked\nvs\n$exact")
  }

  test("plan shape: the predicate is pushed to the decorated code scan; topk_by bound intact") {
    val corpus = planted
    val idx = Files.createTempDirectory("filtered-ann-plan").toString
    BinaryAnn.buildDecoratedIndex(corpus, idx, Seq("label"))
    val plan = BinaryAnn.filteredHammingTopKFromIndex(idx, corpus,
        corpus.filter($"vec_id" === 0L), $"label" === 3, k = 5, candidates = 32)
      .queryExecution.executedPlan.toString
    // predicate reaches the parquet scan of the code table
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PushedFilters: \\[[^\\]]*EqualTo\\(label,3\\).*"),
      s"label predicate not pushed to the code scan:\n$plan")
    // the candidate stage is still the bounded aggregate, not a global sort
    assert(plan.contains("topk_by"), "bounded topk_by cut missing")
  }

  test("decorated index stores codes + metadata, never embeddings") {
    val corpus = planted
    val idx = Files.createTempDirectory("filtered-ann-cols").toString
    BinaryAnn.buildDecoratedIndex(corpus, idx, Seq("label"))
    val cols = spark.read.parquet(idx).columns.toSet
    assert(cols == Set("vec_id", "bits", "label"), s"index columns: $cols")
  }
}
