package graft.queries

import graft.SparkTestBase

/** k-means cluster profile (q98 surface): census invariants +
  * determinism. Exactness vs DuckDB is the driver gate's job
  * (literal-injected centroids, the q82/q90 pattern).
  */
class KmeansProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("census is complete, bounded, and deterministic") {
    val dir = "/root/testdata/sf0.001"
    val a = RetrievalQueries.q98KmeansProfile(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    val b = RetrievalQueries.q98KmeansProfile(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(a == b, "profile must be deterministic across reruns")

    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(a.map(_._2).sum == total, "every vector is censused exactly once")
    assert(a.map(_._1).distinct.size == a.size, "one row per cell")
    assert(a.forall { case (cell, _, _) => cell >= 0 && cell < 16 })
    // micro-quantized cosines are bounded by ±1e6 per vector
    assert(a.forall { case (_, n, sq6) => math.abs(sq6) <= n * 1000000L })
    // vectors sit near their own centroid: cells average clearly positive
    assert(a.forall { case (_, n, sq6) => sq6 > 0L && sq6.toDouble / n > 1e5 },
      "mean cosine-to-assigned-centroid should be solidly positive")
  }
}
