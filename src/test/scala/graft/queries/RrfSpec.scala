package graft.queries

import graft.SparkTestBase

/** q126 reciprocal-rank fusion semantics on a fully planted corpus:
  * exact integer RRF contributions, docs present in one ranking only,
  * and the query vector's self-exclusion from the dense side.
  */
class RrfSpec extends SparkTestBase {
  import spark.implicits._

  test("q126 fuses planted text and vector rankings with exact integer RRF") {
    val dir = java.nio.file.Files.createTempDirectory("rrf-spec").toString
    Seq(
      (0L, "nothing relevant here at all"),              // query vec's doc
      (1L, "merge stream window merge stream window"),   // text rank 1
      (2L, "merge alpha beta gamma"),                    // text rank 2
      (3L, "unrelated content entirely"))                // text absent
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    Seq(
      (0L, Array(1.0f, 0.0f)),  // query; excluded from the dense ranking
      (1L, Array(1.0f, 0.0f)),  // cosine 1.0 -> vec rank 1
      (2L, Array(0.8f, 0.6f)),  // cosine 0.8 -> vec rank 2
      (3L, Array(0.0f, 1.0f)))  // cosine 0.0 -> vec rank 3
      .toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    val out = RetrievalQueries.q126HybridRrf(spark, dir)
      .as[(Long, Option[Int], Option[Int], Long)].collect().toSeq
    assert(out == Seq(
      (1L, Some(1), Some(1), 2 * (1000000L / 61)),            // both rank 1
      (2L, Some(2), Some(2), 2 * (1000000L / 62)),            // both rank 2
      (3L, None, Some(3), 1000000L / 63)),                    // dense-only
      s"got $out")
    assert(!out.exists(_._1 == 0L),
      "the query doc is in neither ranking (no terms; dense excludes self)")
  }
}
