package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deterministic content-keyed split (q37 surface). */
class SplitSpec extends SparkTestBase {
  import spark.implicits._

  test("split is a pure function of content: duplicates co-locate, reruns agree") {
    val dir = java.nio.file.Files.createTempDirectory("split-spec").toString
    // two byte-identical texts under different ids + distinct texts
    val docs = Seq(
      (1L, "the same exact document text"),
      (2L, "the same exact document text"),
      (3L, "a different document entirely"),
      (4L, "yet another body of text here")).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/documents.parquet")

    val a = PipelineQueries.q37DeterministicSplit(spark, dir)
      .as[(Long, Long, String)].collect()
    val b = PipelineQueries.q37DeterministicSplit(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(a.toSeq == b.toSeq, "rerun must agree exactly")
    val byId = a.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == byId(2L), "identical content must land in the same split")
    assert(a.forall(r => Set("train", "valid", "test")(r._3)))
    assert(a.forall(r => r._2 >= 0 && r._2 < 256))
  }

  test("split proportions approach 80/10/10 on the real corpus") {
    val counts = PipelineQueries.q37DeterministicSplit(spark, "/root/testdata/sf0.001")
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(n > 0)
    // md5 is uniform; at small n allow wide tolerance
    assert(counts.getOrElse("train", 0L) / n > 0.6)
    assert(counts.getOrElse("train", 0L) / n < 0.95)
  }
}
